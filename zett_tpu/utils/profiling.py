"""Profiling: jax.profiler trace capture + per-step wall-clock timing.

The reference tracks only a single `time` metric (train.py:1398,1501); the
TPU-native build makes tracing first-class (SURVEY §5.1): `with trace(dir):`
captures a TensorBoard/perfetto-compatible device trace, and StepTimer keeps
a rolling window of step times for steps/s logging.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 100):
        self._times: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def steps_per_second(self) -> float:
        m = self.mean_step_time
        return 1.0 / m if m > 0 else 0.0
