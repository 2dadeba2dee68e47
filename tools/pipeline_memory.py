"""GPipe-vs-1F1B peak-memory on the REAL TPU compiler (AOT, deviceless).

r4 VERDICT stretch item 9: the 1F1B memory claim ("activation memory
scales with S, independent of M, via the min(2S-1, M) input ring +
per-stage recompute") was proven jaxpr-structurally on CPU; this tool
hardens it with the TPU backend's own compile-time accounting.

Method: ``jax.experimental.topologies.get_topology_desc('v5e:2x4')``
gives 8 DEVICELESS v5e devices; ``jit(...).lower(avals).compile()``
against a Mesh over them runs the real TPU compiler (compile-only PJRT
client — no chips needed) and ``compiled.memory_analysis()`` reports the
per-device HBM plan: ``temp_size_in_bytes`` is exactly the activation/
scratch budget the schedule claims to bound.

The PipelinedTrainStep is constructed normally except ``jax.device_put``
is patched to identity during ``__init__`` (deviceless devices cannot
hold buffers; only shapes/shardings matter for AOT), then its ``_jitted``
step is lowered with ShapeDtypeStructs.

Config: S=4 MLP stages (Linear d->4d, GELU, Linear 4d->d), bf16 compute,
dp=2 x pp=4, microbatch FIXED at 64 rows while M scales the global batch
(B = 64*M) — the regime where GPipe's saved residual stacks grow with M
and 1F1B's ring must not.

Usage: python tools/pipeline_memory.py [--m 4,8,16,32] [--d 2048]
"""
from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


@contextlib.contextmanager
def _identity_device_put():
    """Patch jax.device_put to a no-op (module-level + pipeline's view)."""
    import jax

    real = jax.device_put

    def fake(x, device=None, **kw):  # noqa: ARG001
        return x

    jax.device_put = fake
    try:
        yield
    finally:
        jax.device_put = real


def _sds(a):
    """ShapeDtypeStruct for any array-ish leaf (None passes through)."""
    import jax
    import jax.numpy as jnp

    if a is None:
        return None
    if hasattr(a, "shape") and hasattr(a, "dtype"):
        return jax.ShapeDtypeStruct(a.shape, a.dtype)
    return jax.ShapeDtypeStruct(np.shape(a), jnp.result_type(a))


def build_and_measure(schedule: str, m: int, d: int, micro_rows: int):
    import jax

    from deepflows_tpu import nn, optim
    from deepflows_tpu.backend.lazy import force as _lz
    from deepflows_tpu.parallel import PipelineStack, PipelinedTrainStep
    from deepflows_tpu.parallel.mesh import make_mesh
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    mesh = make_mesh({"data": 2, "pipe": 4}, list(topo.devices))

    S = 4
    import deepflows_tpu as df

    df.manual_seed(0)
    stages = [
        nn.Sequential(
            nn.Linear(d, 4 * d, device="cpu"),
            nn.GELU(),
            nn.Linear(4 * d, d, device="cpu"),
        )
        for _ in range(S)
    ]
    stack = PipelineStack(stages)
    opt = optim.Adam(stack.parameters(), lr=1e-3)
    with _identity_device_put():
        pstep = PipelinedTrainStep(
            stack,
            opt,
            nn.MSELoss(),
            mesh,
            n_micro=m,
            schedule=schedule,
            compute_dtype=jax.numpy.bfloat16,
        )

    B = micro_rows * m
    p_sds = [_sds(_lz(p.data.array)) for p in pstep._params]
    b_sds = [_sds(_lz(b.data.array)) for b in pstep._buffers]
    opt_sds = jax.tree.map(
        _sds, opt._state, is_leaf=lambda x: x is None
    )
    lr_sds = _sds(np.float32(1e-3))
    x_sds = jax.ShapeDtypeStruct((B, d), np.float32)
    y_sds = jax.ShapeDtypeStruct((B, d), np.float32)

    t0 = time.time()
    lowered = pstep._jitted.lower(p_sds, b_sds, opt_sds, lr_sds, x_sds, y_sds)
    compiled = lowered.compile()
    dt = time.time() - t0
    ma = compiled.memory_analysis()
    return {
        "schedule": schedule,
        "M": m,
        "B": B,
        "temp_mib": ma.temp_size_in_bytes / 2**20,
        "args_mib": ma.argument_size_in_bytes / 2**20,
        "compile_s": round(dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", default="4,8,16,32")
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--micro-rows", type=int, default=64)
    ap.add_argument("--schedules", default="gpipe,1f1b")
    args = ap.parse_args()

    rows = []
    for sched in args.schedules.split(","):
        for m in (int(v) for v in args.m.split(",")):
            r = build_and_measure(sched, m, args.d, args.micro_rows)
            rows.append(r)
            print(json.dumps(r), flush=True)

    print("\n| schedule | M | global B | temp MiB/device | compile s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['schedule']} | {r['M']} | {r['B']} | "
            f"{r['temp_mib']:.1f} | {r['compile_s']} |"
        )


if __name__ == "__main__":
    main()
