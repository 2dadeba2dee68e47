"""Mesh-parallel training demo (no reference analog — the reference has no
distributed code, SURVEY §2.3).  Trains CIFAR10_CNN data-parallel (+optional
tensor-parallel Linear sharding) over a jax.sharding Mesh; on a machine
without N real chips, forces N virtual host-CPU devices.

    python distributed_train.py --devices 8 --model-parallel 2 --epochs 2
"""

from __future__ import annotations

import argparse
import os
import sys


def ensure_devices(n: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    if len(jax.devices()) < n:
        sys.exit(f"need {n} devices, have {len(jax.devices())}")


def main(devices=8, model_parallel=2, epochs=2, batch_size=64, limit=1024, zero=False):
    ensure_devices(devices)
    import numpy as np

    import deepflows_tpu as df
    from deepflows_tpu import models, nn, optim
    from deepflows_tpu.parallel import (
        ShardedTrainStep,
        make_mesh,
        tensor_parallel_rules,
    )
    from deepflows_tpu.utils.data import data_loader

    from common import get_cifar10

    df.manual_seed(0)
    if devices % model_parallel:
        model_parallel = 1  # e.g. --devices 1 single-chip anchor run
    mesh = make_mesh(
        {"data": devices // model_parallel, "model": model_parallel}
    )
    print(f"mesh: {dict(mesh.shape)}")
    x_train, y_train, *_ = get_cifar10(limit=limit)
    model = models.CIFAR10_CNN(device="tpu")
    opt = optim.Adam(model.parameters(), lr=1e-3)
    step = ShardedTrainStep(
        model,
        opt,
        nn.CrossEntropyLoss(),
        mesh,
        param_rules=tensor_parallel_rules("model") if model_parallel > 1 else None,
        zero_shard_state=zero,  # ZeRO-1: optimizer state stored data-sharded
    )
    import time

    import jax

    n_chips = devices
    throughput = []
    for epoch in range(epochs):
        losses = []
        t0 = time.time()
        n_images = 0
        for xb, yb in data_loader(
            x_train, y_train, batch_size, shuffle=True, drop_last=True
        ):
            losses.append(step(xb, yb))
            n_images += len(yb)
        # force completion before reading the clock (async dispatch) — one
        # device_get for all step losses, not one transfer per step
        epoch_loss = float(np.mean(jax.device_get(losses)))
        dt = time.time() - t0
        ips = n_images / dt
        throughput.append(ips)
        print(
            f"epoch {epoch}: loss={epoch_loss:.4f} "
            f"{ips:,.0f} img/s total = {ips / n_chips:,.0f} img/s/chip "
            f"({n_chips} devices)"
        )
    fc = model.fc.weight.data.array
    print(
        f"fc weight sharding: {fc.sharding.spec if hasattr(fc.sharding, 'spec') else fc.sharding}"
        f" over {len(fc.sharding.device_set)} devices"
    )
    best = max(throughput)
    print(
        f"scaling summary: devices={n_chips} batch={batch_size} "
        f"best={best:,.0f} img/s ({best / n_chips:,.0f} img/s/chip) — "
        "rerun with --devices 1 to get the single-chip anchor for DP efficiency"
    )
    return best


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--model-parallel", type=int, default=2)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--limit", type=int, default=1024)
    p.add_argument("--zero", action="store_true", help="ZeRO-1 sharded optimizer state")
    args = p.parse_args()
    main(args.devices, args.model_parallel, args.epochs, args.batch_size, args.limit, args.zero)
