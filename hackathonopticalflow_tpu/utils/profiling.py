"""Timing / metrics utilities.

Replaces the reference's manual time.time_ns FPS arithmetic
(pathfinder_viewer.py:339-356) and the OpenCV-rendered Plotter
(Operations.py:128-200) with plain counters plus optional jax.profiler
trace capture for kernel-level roofline work.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


class Timer:
    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def __call__(self):
        t0 = time.perf_counter()
        yield
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class FpsCounter:
    """Sliding-window FPS (the reference recomputes per frame from ns
    deltas; a short window is steadier)."""

    def __init__(self, window: int = 30):
        self.times = deque(maxlen=window)

    def tick(self) -> float:
        now = time.perf_counter()
        self.times.append(now)
        if len(self.times) < 2:
            return 0.0
        return (len(self.times) - 1) / (self.times[-1] - self.times[0])


@contextlib.contextmanager
def device_trace(out_dir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
