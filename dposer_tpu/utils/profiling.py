"""Lightweight profiling/tracing — new capability over the reference
(SURVEY §5.1: the reference has zero instrumentation).

- ``trace_annotation``: named XLA trace spans (visible in TensorBoard
  profiler / xprof) via ``jax.profiler.TraceAnnotation``.
- ``StepTimer``: wall-clock step timing with jitted-async awareness
  (synchronizes on demand), EMA-smoothed rate reporting.
- ``profile_trace``: context manager dumping a full device trace to a dir.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def trace_annotation(name: str):
    """Named span for the profiler timeline (no-op overhead when not tracing)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace (view with TensorBoard profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter for training/sampling loops.

    ``tick(sync=x)`` marks a step; pass a device array occasionally to
    synchronize (async dispatch otherwise hides device time).
    """

    def __init__(self, smoothing: float = 0.98):
        self.smoothing = smoothing
        self._last: Optional[float] = None
        self._rate: Optional[float] = None
        self.steps = 0

    def tick(self, sync=None) -> Optional[float]:
        if sync is not None:
            jax.block_until_ready(sync)
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            inst = 1.0 / max(dt, 1e-9)
            self._rate = inst if self._rate is None else (
                self.smoothing * self._rate + (1 - self.smoothing) * inst)
        self._last = now
        self.steps += 1
        return self._rate

    @property
    def steps_per_sec(self) -> Optional[float]:
        return self._rate
