"""Profiling / tracing helpers (the reference has none - SURVEY.md section 5).

* `trace(dir)` - context manager around jax.profiler for TensorBoard traces
* `StepTimer` - rolling wall-clock timer with steps/sec + samples/sec
* `annotate(name)` - TraceAnnotation for labelling regions inside a step
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, window: int = 50):
        self.times: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
        self._last = now
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def samples_per_sec(self, batch_size: int) -> float:
        return self.steps_per_sec * batch_size
