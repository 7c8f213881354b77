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


class StepWindowProfiler:
    """Capture a jax.profiler device trace of train steps ``[start, stop)``.

    Wired into ``Trainer.fit`` via ``Trainer(profile_dir=...)``: one command
    reproduces the device traces the optimization notes describe (VERDICT
    §5.1 — upstream has nothing; its only signal is the Keras progress bar,
    reference utils.py:233-240).

    The window edges block on the steps' outputs so queued async dispatches
    from *other* steps don't leak into the trace; everything between the
    edges stays fully asynchronous (the steady-state schedule being profiled).
    """

    def __init__(self, logdir: str, start: int = 2, stop: int = 5):
        if stop <= start:
            raise ValueError(f"profile window [{start}, {stop}) is empty")
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self.active = False
        self.done = False

    def before_step(self, step: int, blockers=None):
        """Call before dispatching ``step``; pass the previous step's
        outputs as ``blockers`` so the trace starts from a drained queue."""
        if self.done or self.active or step != self.start:
            return
        import jax
        if blockers is not None:
            jax.block_until_ready(blockers)
        jax.profiler.start_trace(self.logdir)
        self.active = True

    def after_step(self, step: int, blockers=None):
        """Call after dispatching ``step``; closes the window at stop-1."""
        if not self.active or step != self.stop - 1:
            return
        import jax
        if blockers is not None:
            jax.block_until_ready(blockers)
        jax.profiler.stop_trace()
        self.active = False
        self.done = True

    def close(self):
        """Stop a still-open trace (short epochs / early exceptions)."""
        if self.active:
            import jax
            jax.profiler.stop_trace()
            self.active = False
            self.done = True
