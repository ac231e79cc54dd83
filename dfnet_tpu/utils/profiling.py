"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5: remnants of commented-out timers
only). Here: a step timer with EMA + percentile summaries, and a
jax.profiler trace context for capturing TensorBoard-viewable device
traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Dict, Optional

import numpy as np


class StepTimer:
    """Wall-clock step timer with exponential moving average and
    percentile reporting.

    Usage:
        timer = StepTimer()
        with timer.step():
            ... one training step ...
        print(timer.summary())
    """

    def __init__(self, window: int = 200, ema_alpha: float = 0.05):
        self.samples: Deque[float] = deque(maxlen=window)
        self.ema: Optional[float] = None
        self.alpha = ema_alpha
        self.count = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.add(dt)

    def add(self, dt: float):
        self.samples.append(dt)
        self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt
        self.count += 1

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "steps": self.count,
            "mean_ms": float(arr.mean() * 1e3),
            "ema_ms": float((self.ema or 0.0) * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """Capture a jax.profiler device trace into `logdir` (no-op if None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
