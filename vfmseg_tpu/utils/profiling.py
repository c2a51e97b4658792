"""Profiling / observability helpers (SURVEY §5.1 TPU equivalents).

The reference has no custom tracing (mmengine IterTimerHook only); here:
  * trace(): context manager around jax.profiler for TensorBoard-viewable
    TPU traces
  * StepTimer: wall-clock images/sec + steps/sec meter (the measurement tool
    for the BASELINE metric)
  * debug-NaN toggling for the jit purity analogue of sanitizers (§5.2)
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True):
    """jit-compatible NaN checks (SURVEY §5.2: the TPU analogue of
    sanitizers). Slows execution; use for debugging only."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Streaming steps/sec + images/sec meter."""

    def __init__(self, batch_size: int = 1, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._t0: Optional[float] = None
        self._count = 0

    def tick(self) -> Optional[dict]:
        now = time.time()
        if self._t0 is None:
            self._t0 = now
            return None
        self._count += 1
        if self._count % self.window:
            return None
        dt = now - self._t0
        self._t0 = now
        steps_per_sec = self.window / max(dt, 1e-9)
        out = {
            "steps_per_sec": steps_per_sec,
            "images_per_sec": steps_per_sec * self.batch_size,
        }
        return out
