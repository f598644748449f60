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
    host work (they never touch jax). The pool forks EAGERLY at
    construction — forking lazily at first iteration would happen after
    the caller has initialized the JAX runtime (train/loop.py builds
    the loader first, then the train state), and forking a process
    whose runtime threads hold locks can deadlock the child. If the
    runtime IS already initialized when the pool is built, fork is no
    longer safe (observed: children deadlock with 0 CPU before reaching
    Python) — the pool falls back to spawn with a warning; spawned
    workers re-import and receive a pickled copy of the dataset instead
    of the copy-on-write pages. One pool serves every epoch; per-epoch
    index lists travel through the task queue, tagged so an abandoned
    epoch's stale results are discarded.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import sys
import threading
import warnings
from typing import Dict, Iterator, List, Sequence

import numpy as np


def _fork_hazardous() -> bool:
    """True when the JAX runtime has already initialized a backend in
    this process. Forking then duplicates a process whose XLA/PJRT
    threads may hold locks the child can never release — observed as a
    hard child deadlock (0 CPU, never reaches Python) even with the CPU
    backend, and reliably with the remote-TPU plugin. The eager-fork
    contract (module docstring) avoids this by building the loader
    before the first JAX op; when a caller builds it after, the pool
    falls back to spawn instead of gambling."""
    if sys.modules.get("jax") is None:
        return False
    try:
        from jax._src import xla_bridge
        return bool(xla_bridge._backends)
    except Exception:
        return False


def _get_item(dataset, i: int, resample_on_error: bool, seed: int,
              max_retries: int):
    """Fetch item ``i``, optionally resampling on error (the
    reference's BaseDataset failure-recovery contract)."""
    if not resample_on_error:
        return dataset[i]
    rng = np.random.default_rng(seed * 1000003 + i)
    for _ in range(max_retries):
        try:
            return dataset[i]
        except Exception:
            i = int(rng.integers(len(dataset)))
    return dataset[i]  # final attempt surfaces the error


def _worker_loop(dataset, resample_on_error: bool, seed: int,
                 max_retries: int, in_q, out_q):
    """Persistent worker-process loop: tasks are (tag, bi, idx_list);
    None shuts the worker down. Results echo (tag, bi, batch_or_exc).
    Module-level (not a DataLoader method) so spawn contexts pickle
    only the dataset + scalars, never the loader with its Process
    handles."""
    while True:
        task = in_q.get()
        if task is None:
            return
        tag, bi, idxs = task
        try:
            out_q.put((tag, bi, collate([
                _get_item(dataset, i, resample_on_error, seed,
                          max_retries) for i in idxs])))
        except Exception as e:
            out_q.put((tag, bi, e))


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
        self._procs: List = []
        if self.num_workers > 0:
            # eager fork: see module docstring (must precede JAX init)
            ctx_name = self.mp_context
            if ctx_name == "fork" and _fork_hazardous():
                warnings.warn(
                    "DataLoader: the JAX runtime is already initialized; "
                    "fork workers can deadlock in the child. Using spawn "
                    "instead (build the loader before the first JAX op, "
                    "or pass mp_context explicitly, to override).")
                ctx_name = "spawn"
            ctx = mp.get_context(ctx_name)
            self._in_q = ctx.Queue()
            self._out_q = ctx.Queue(maxsize=max(2, self.prefetch))
            self._procs = [
                ctx.Process(target=_worker_loop,
                            args=(self.dataset, self.resample_on_error,
                                  self.seed, self.max_retries,
                                  self._in_q, self._out_q), daemon=True)
                for _ in range(self.num_workers)]
            for p in self._procs:
                p.start()

    def close(self):
        """Shut the worker pool down (idempotent)."""
        for _ in self._procs:
            try:
                self._in_q.put_nowait(None)
            except Exception:
                pass
        for p in self._procs:
            p.terminate()
        for p in self._procs:
            p.join(timeout=5)
        self._procs = []

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _get(self, i: int):
        return _get_item(self.dataset, i, self.resample_on_error,
                         self.seed, self.max_retries)

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

    def _iter_processes(self, batches) -> Iterator[Dict]:
        tag = self._epoch           # discriminates abandoned epochs
        for bi, idxs in enumerate(batches):
            self._in_q.put((tag, bi, list(idxs)))
        pending: Dict[int, Dict] = {}
        nxt = 0
        while nxt < len(batches):
            while nxt not in pending:
                rtag, bi, item = self._out_q.get()
                if rtag != tag:
                    continue        # stale result of an abandoned epoch
                pending[bi] = item
            item = pending.pop(nxt)
            nxt += 1
            if isinstance(item, Exception):
                raise item
            yield item

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

        def put_or_stop(item) -> bool:
            # a plain q.put() on a full queue never observes `stop`, so
            # a consumer that abandons the iterator (e.g. max_iters
            # early return) would leak this thread blocked forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    if not put_or_stop(collate([self._get(i)
                                                for i in b])):
                        return
            except Exception as e:  # surface loader errors to consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

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
