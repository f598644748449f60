"""Lightweight batching data loader with background prefetch.

Replaces torch's DataLoader (apps/train_SuRS.py:40-49). Items are numpy
dicts; batches stack array-valued keys along axis 0. A thread pool
prefetches ahead of the training step so host-side sampling overlaps
device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np


def collate(items: Sequence[Dict]) -> Dict:
    out: Dict = {}
    for k in items[0]:
        v0 = items[0][k]
        if isinstance(v0, np.ndarray):
            out[k] = np.stack([it[k] for it in items], axis=0)
        else:
            out[k] = [it[k] for it in items]
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 num_threads: int = 1, prefetch: int = 2,
                 seed: int = 0, drop_last: bool = True,
                 resample_on_error: bool = False, max_retries: int = 8):
        """``resample_on_error`` implements the reference's documented
        failure-recovery contract (lib/data/BaseDataset.py:24-45): an item
        that raises (missing file, IO error) is replaced by a random
        other item instead of killing the epoch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_last = drop_last
        self.resample_on_error = resample_on_error
        self.max_retries = max_retries
        self._epoch = 0

    def _get(self, i: int):
        if not self.resample_on_error:
            return self.dataset[i]
        rng = np.random.default_rng(self.seed * 1000003 + i)
        for _ in range(self.max_retries):
            try:
                return self.dataset[i]
            except Exception:
                i = int(rng.integers(len(self.dataset)))
        return self.dataset[i]  # final attempt surfaces the error

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size:(i + 1) * self.batch_size].tolist()
                for i in range(nb)]

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_threads <= 1 and self.prefetch <= 1:
            for b in batches:
                yield collate([self._get(i) for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(collate([self._get(i) for i in b]))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
