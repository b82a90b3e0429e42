"""Block timers (TPU replacement for the reference's CudaTimer,
/root/reference/droid_slam/cuda_timer.py:3-23): wall-clock timing with a
block_until_ready barrier, plus an optional jax.profiler trace context."""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """with Timer("frontend"): ... — prints elapsed ms (device-synchronized)."""

    def __init__(self, name: str, enabled: bool = True, sync=None):
        self.name = name
        self.enabled = enabled
        self.sync = sync  # array/pytree to block on at exit

    def __enter__(self):
        if self.enabled:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            if self.sync is not None:
                jax.block_until_ready(self.sync)
            dt = 1000.0 * (time.perf_counter() - self.t0)
            print(f"{self.name}: {dt:.2f} ms")


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace for TensorBoard (the nsys/torch.profiler analog)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
