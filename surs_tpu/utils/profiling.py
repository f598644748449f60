"""Profiling and timing utilities.

The reference's only observability is wall-clock deltas printed per
iteration (apps/train_SuRS.py:111,150-160 — SURVEY.md §5). Here:

  * ``timed`` — block timer that block_until_ready()s jax values;
  * ``Profiler`` — wrapper over jax.profiler trace collection
    (``--profile_dir`` config knob) for xprof/tensorboard analysis;
  * ``annotate`` — TraceAnnotation context for named regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None, sync=None):
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = results.get(label, 0.0) + dt
    else:
        print(f"[timing] {label}: {dt:.4f}s")


class Profiler:
    def __init__(self, profile_dir: Optional[str] = None):
        self.dir = profile_dir
        self._active = False

    def start(self):
        if self.dir and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True

    def stop(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


def annotate(name: str):
    """Named trace region (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)
