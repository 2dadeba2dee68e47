"""Pipeline-parallel training demo (no reference analog — the reference has
no distributed code, SURVEY §2.3).  Trains a stack of homogeneous MLP blocks
GPipe-style over a ``{'data': D, 'pipe': S}`` mesh: each pipe rank holds one
stage's weights, microbatches flow through ICI collective-permutes, and the
backward pipeline falls out of ``jax.grad`` (parallel/pipeline.py).  On a
machine without N real chips, forces N virtual host-CPU devices.

    python pipeline_train.py --devices 8 --stages 4 --micro 8
"""

from __future__ import annotations

import argparse

from distributed_train import ensure_devices


def main(devices=8, stages=4, micro=8, epochs=3, batch_size=256, width=64):
    ensure_devices(devices)
    import time

    import jax
    import numpy as np

    import deepflows_tpu as df
    from deepflows_tpu import nn, optim
    from deepflows_tpu.parallel import (
        PipelinedTrainStep,
        PipelineStack,
        make_mesh,
    )

    if devices % stages:
        raise SystemExit(f"--devices {devices} not divisible by --stages {stages}")
    mesh = make_mesh({"data": devices // stages, "pipe": stages})
    print(f"mesh: {dict(mesh.shape)}  (bubble fraction {(stages - 1) / (micro + stages - 1):.0%})")

    df.manual_seed(0)
    stack = PipelineStack(
        [
            nn.Sequential(
                nn.Linear(width, width, device="tpu"),
                nn.ReLU(),
                nn.Linear(width, width, device="tpu"),
                nn.ReLU(),
            )
            for _ in range(stages)
        ]
    )
    opt = optim.Adam(stack.parameters(), lr=1e-3)
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=micro
    )

    # synthetic regression task: a fixed random deep teacher
    r = np.random.default_rng(0)
    W = r.standard_normal((width, width)).astype(np.float32) * 0.3
    x_all = r.standard_normal((batch_size * 8, width)).astype(np.float32)
    y_all = np.tanh(x_all @ W)

    for epoch in range(epochs):
        losses = []
        t0 = time.time()
        n = 0
        for i in range(0, len(x_all), batch_size):
            xb, yb = x_all[i : i + batch_size], y_all[i : i + batch_size]
            losses.append(step(xb, yb))
            n += len(xb)
        epoch_loss = float(np.mean(jax.device_get(losses)))
        dt = time.time() - t0
        print(
            f"epoch {epoch}: loss={epoch_loss:.4f} "
            f"{n / dt:,.0f} samples/s over {devices} devices "
            f"(S={stages} pipeline x {devices // stages}-way data)"
        )
    p0 = [p for p in stack.parameters()][0].data.array
    print(f"stacked param 0: shape={p0.shape} sharding={p0.sharding.spec}")
    return epoch_loss


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--stages", type=int, default=4)
    p.add_argument("--micro", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--width", type=int, default=64)
    args = p.parse_args()
    main(args.devices, args.stages, args.micro, args.epochs, args.batch_size, args.width)
