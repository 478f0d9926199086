"""Step profiling (rebuild of the Chrome-trace pattern in
``train_loop.py:69-83`` and the per-iter timing everywhere).

* ``profile_step`` — capture a jax.profiler trace for iterations
  [start, start+count) — keeps the reference's "profile one step N" pattern
  but produces a TensorBoard/Perfetto trace instead of timeline.ctf.json.
* ``StepTimer`` — wall-clock secs/iter with data-time vs step-time split
  (train_loop_2.py:231).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["profile_step", "StepTimer"]


@contextlib.contextmanager
def profile_step(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._data_time = 0.0

    @contextlib.contextmanager
    def data(self):
        t = time.perf_counter()
        yield
        self._data_time += time.perf_counter() - t

    def lap(self) -> tuple[float, float]:
        """(total secs since reset, data secs)."""
        total = time.perf_counter() - self._t0
        data = self._data_time
        self.reset()
        return total, data
