"""Profiling + debugging hooks (SURVEY §5 tracing/observability rows).

The reference's only observability is a per-epoch loss print. Here:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (open with xprof / tensorboard-profile);
  * :class:`StepTimer` — throughput meter reporting steps/s and
    megapixels/s (the BASELINE.json unit), relay-safe (syncs through a
    caller-provided scalar, not block_until_ready — see bench.py note);
  * :func:`enable_nan_debugging` — flips ``jax_debug_nans`` so the first
    NaN-producing primitive raises with a stack trace.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): run_steps()`` → profiler dump."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Wall-clock throughput over a window of steps.

    Call :meth:`tick` once per step with a device scalar to sync on
    (e.g. the loss); reading it forces completion of the step's work.
    """

    def __init__(self, pixels_per_step: float = 0.0, window: int = 50):
        self.pixels_per_step = pixels_per_step
        self.window = window
        self._count = 0
        self._t0 = None
        self.last_steps_per_s = 0.0
        self.last_mps = 0.0

    def tick(self, sync_scalar=None) -> dict | None:
        if sync_scalar is not None:
            float(sync_scalar)  # forces the step chain to complete
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._count += 1
        if self._count >= self.window:
            dt = now - self._t0
            self.last_steps_per_s = self._count / dt
            self.last_mps = self.pixels_per_step * self._count / dt / 1e6
            self._count = 0
            self._t0 = now
            return {
                "steps_per_s": round(self.last_steps_per_s, 3),
                "megapixels_per_s": round(self.last_mps, 3),
            }
        return None
