"""Tracing / profiling hooks (SURVEY §5: the reference only has ad-hoc
wall-clock prints; jax.profiler integration is the TPU superset)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/deepflows_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto:

    >>> with trace("/tmp/tr"):
    ...     step(x, y)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing with device sync on demand."""

    def __init__(self, sync_every: int = 0):
        self.sync_every = sync_every
        self.times = []
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t)
        return False

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = sorted(self.times)
        n = len(arr)
        return {
            "steps": n,
            "mean_s": sum(arr) / n,
            "p50_s": arr[n // 2],
            "p95_s": arr[min(n - 1, int(n * 0.95))],
        }


def device_memory_stats(device_index: int = 0) -> Optional[dict]:
    """Per-device HBM statistics (the reference polled pynvml,
    `test/CNN_Dishes_cuda_gpu_monitor.py:126-137`)."""
    import jax

    try:
        return jax.devices()[device_index].memory_stats()
    except Exception:
        return None
