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


# bf16 MXU peak TFLOP/s per chip by device_kind substring (same table as
# bench.py; the scaling-book numbers for each generation)
_PEAK_TFLOPS = [
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0), ("v5", 459.0),
    ("v6 lite", 918.0), ("v6e", 918.0), ("v4", 275.0), ("v3", 123.0),
    ("v2", 46.0),
]

# approximate HBM GB/s per chip for the roofline
_HBM_GBS = [
    ("v5 lite", 819.0), ("v5e", 819.0), ("v5p", 2765.0), ("v5", 2765.0),
    ("v6 lite", 1640.0), ("v6e", 1640.0), ("v4", 1228.0), ("v3", 900.0),
]


def _lookup(table, kind):
    kind = kind.lower()
    for sub, v in table:
        if sub in kind:
            return v
    return None


def step_report(step, *example_args) -> dict:
    """Static cost report for a Compiled{Train,Eval}Step: FLOPs, HBM bytes,
    arithmetic intensity, and the roofline-predicted step time on this chip.

    >>> rep = step_report(train_step, x, y)
    >>> print(rep["summary"])

    Uses the compiled program's own HLO counters (the same source bench.py
    publishes MFU from).  Purely static — does not run the step."""
    import jax
    import numpy as np

    from ..jit import _TRACE_LOCK

    # gather AND lower under the lock: a concurrent donate=True train step
    # deletes the gathered arrays inside its own locked window; lowering
    # re-enters the RLock from this thread, which is fine
    with _TRACE_LOCK:  # a concurrent trace binds tracers into the params
        from ..backend.lazy import force as _lz

        param_arrays = [_lz(p.data.array) for p in step._params]
        buffer_arrays = [_lz(b.data.array) for b in step._buffers]
        if hasattr(step, "optimizer"):  # train step
            args = (
                param_arrays,
                buffer_arrays,
                step.optimizer._state,
                np.float32(step.optimizer.lr),
                np.int32(0),
                *example_args,
            )
        else:  # eval step
            args = (param_arrays, buffer_arrays, *example_args)
        lowered = step._jitted.lower(*args)
    ca = None
    for stage in (lambda: lowered.cost_analysis(),
                  lambda: lowered.compile().cost_analysis()):
        try:
            ca = stage()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if ca and ca.get("flops"):
                break
        except Exception:
            ca = None
    if not ca:
        return {"error": "cost analysis unavailable on this backend"}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    kind = jax.devices()[0].device_kind
    peak = _lookup(_PEAK_TFLOPS, kind)
    hbm = _lookup(_HBM_GBS, kind)
    rep = {
        "device_kind": kind,
        "flops_per_step": flops,
        "bytes_per_step": byts,
        "arithmetic_intensity": flops / byts if byts else None,
    }
    if peak and hbm and byts:
        t_compute = flops / (peak * 1e12)
        t_memory = byts / (hbm * 1e9)
        bound = "HBM-bandwidth" if t_memory > t_compute else "compute"
        rep.update(
            compute_bound_ms=t_compute * 1e3,
            memory_bound_ms=t_memory * 1e3,
            roofline_ms=max(t_compute, t_memory) * 1e3,
            bound=bound,
        )
        rep["summary"] = (
            f"{flops/1e9:.2f} GFLOP, {byts/1e9:.2f} GB/step, "
            f"AI={flops/byts:.1f} FLOP/B on {kind}: {bound}-bound, "
            f"roofline >= {rep['roofline_ms']:.2f} ms/step"
        )
    else:
        rep["summary"] = f"{flops/1e9:.2f} GFLOP, {byts/1e9:.2f} GB/step"
    return rep
