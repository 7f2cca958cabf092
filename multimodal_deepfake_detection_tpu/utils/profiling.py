"""Tracing / profiling hooks (SURVEY.md §5 — the reference has only
``time.time()`` wall-clock epochs; this adds device-level observability).

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto-loadable trace of XLA execution.
* ``StepTimer`` — lightweight per-step wall timing with percentile summary
  (host-side; remember this environment's relay resolves futures early, so
  wrap timed regions around host readbacks for true device timing).
* ``annotate`` — named ``TraceAnnotation`` regions that show up in traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, name: str = "step"):
        self.name = name
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> str:
        if not self.times:
            return f"{self.name}: no samples"
        arr = np.asarray(self.times) * 1000
        return (
            f"{self.name}: n={len(arr)} mean={arr.mean():.2f}ms "
            f"p50={np.percentile(arr, 50):.2f}ms p95={np.percentile(arr, 95):.2f}ms "
            f"max={arr.max():.2f}ms"
        )
