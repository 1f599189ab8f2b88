"""Tracing / profiling helpers (SURVEY.md section 5: absent in the reference
beyond tqdm it/s; required here to substantiate the throughput claims).

- StepTimer: rolling step-time and clips/s counters for training loops.
- trace(): context manager around jax.profiler for on-demand device traces
  viewable in TensorBoard/Perfetto.
- debug_nan_mode(): opt-in jax NaN checking for debugging runs (the
  functional-JAX substitute for sanitizers).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque


class StepTimer:
    """Rolling window step timer: call tick(batch_clips) once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: Deque[float] = deque(maxlen=window + 1)
        self._clips: Deque[int] = deque(maxlen=window)

    def tick(self, clips: int = 0) -> None:
        self._times.append(time.perf_counter())
        self._clips.append(clips)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0

    @property
    def clips_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        n = sum(list(self._clips)[-(len(self._times) - 1):])
        return n / span if span > 0 else 0.0

    @property
    def ms_per_step(self) -> float:
        sps = self.steps_per_sec
        return 1000.0 / sps if sps > 0 else float("nan")


@contextlib.contextmanager
def trace(log_dir: str, *, host: bool = False):
    """Capture a jax.profiler device trace into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nan_mode():
    """Enable jax_debug_nans within the context (training debug aid)."""
    import jax

    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
