"""Tracing & profiling (SURVEY.md §5.1 — absent upstream, first-class here).

- ``StepTimer``: rolling per-step wall times + device-step breakdown.
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace directory for a window of steps.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


class StepTimer:
    """Rolling window of step wall-times with throughput accounting."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1):
        assert self._t0 is not None
        self.times.append((time.perf_counter() - self._t0, items))
        self._t0 = None

    @property
    def mean_step_s(self) -> float:
        if not self.times:
            return 0.0
        return sum(t for t, _ in self.times) / len(self.times)

    @property
    def items_per_s(self) -> float:
        total_t = sum(t for t, _ in self.times)
        total_i = sum(i for _, i in self.times)
        return total_i / total_t if total_t else 0.0

    def summary(self) -> str:
        return (f"{self.mean_step_s * 1e3:.1f} ms/step, "
                f"{self.items_per_s:.1f} items/s")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard / Perfetto)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up in the profiler timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
