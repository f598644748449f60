"""Lightweight batching data loader with background prefetch.

Replaces torch's DataLoader (apps/train_SuRS.py:40-49). Items are numpy
dicts; batches stack array-valued keys along axis 0. Two overlap modes:

  * ``num_threads`` > 1 / ``prefetch``: a background thread pipelines
    batch construction ahead of the training step (enough when item
    construction is IO-bound);
  * ``num_workers`` > 0: worker PROCESSES build batches in parallel —
    the equivalent of the reference's DataLoader worker subprocesses
    (apps/train_SuRS.py:40-49) for the numpy/PIL-heavy sampling path,
    which is GIL-bound under threads. Batches are re-ordered to the
    deterministic epoch order, so results are identical to the
    single-process loader. Uses fork (default) so the dataset and its
    in-RAM mesh cache are inherited copy-on-write; workers must only do
    host work (they never touch jax, and fork happens lazily at first
    iteration).
"""

from __future__ import annotations

import multiprocessing as mp
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
                 resample_on_error: bool = False, max_retries: int = 8,
                 num_workers: int = 0, mp_context: str = "fork"):
        """``resample_on_error`` implements the reference's documented
        failure-recovery contract (lib/data/BaseDataset.py:24-45): an item
        that raises (missing file, IO error) is replaced by a random
        other item instead of killing the epoch. ``num_workers`` > 0
        switches to process-parallel batch construction (module
        docstring)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_last = drop_last
        self.resample_on_error = resample_on_error
        self.max_retries = max_retries
        self.num_workers = max(0, num_workers)
        self.mp_context = mp_context
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

    def _worker_proc(self, batches, in_q, out_q):
        """Worker-process loop: build whole batches, push (index, batch)."""
        while True:
            bi = in_q.get()
            if bi is None:
                return
            try:
                out_q.put((bi, collate([self._get(i)
                                        for i in batches[bi]])))
            except Exception as e:
                out_q.put((bi, e))

    def _iter_processes(self, batches) -> Iterator[Dict]:
        ctx = mp.get_context(self.mp_context)
        in_q = ctx.Queue()
        out_q = ctx.Queue(maxsize=max(2, self.prefetch))
        nw = min(self.num_workers, max(1, len(batches)))
        procs = [ctx.Process(target=self._worker_proc,
                             args=(batches, in_q, out_q), daemon=True)
                 for _ in range(nw)]
        for p in procs:
            p.start()
        try:
            for bi in range(len(batches)):
                in_q.put(bi)
            for _ in range(nw):
                in_q.put(None)
            pending: Dict[int, Dict] = {}
            nxt = 0
            while nxt < len(batches):
                while nxt not in pending:
                    bi, item = out_q.get()
                    pending[bi] = item
                item = pending.pop(nxt)
                nxt += 1
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_workers > 0:
            yield from self._iter_processes(batches)
            return
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
