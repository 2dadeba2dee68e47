"""Benchmark: CIFAR10-CNN training throughput (images/sec/chip) on the real
TPU via the compiled whole-step path.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is the speedup of the compiled whole-step path over eager
per-op tape execution on the same chip — the faithful stand-in for the
reference's execution model (one CUDA kernel launch per op,
`DeepFlows/backend/backend_src/ndarray_backend_cuda.cu`), since the
reference publishes no throughput numbers (BASELINE.md: "not recorded").
Set BENCH_EAGER=0 to skip the eager baseline (vs_baseline=null).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import deepflows_tpu as df
    from deepflows_tpu import Tensor, models, nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    model_name = os.environ.get("BENCH_MODEL", "cifar10_cnn")
    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    # enough steps that the final host-readback (the only true sync point
    # through this environment's TPU tunnel) amortizes to noise
    steps = int(os.environ.get("BENCH_STEPS", "200"))
    warmup = 5

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch_size, 3, 32, 32)).astype(np.float32)
    y = rng.integers(0, 10, batch_size).astype(np.int32)
    # stage the batch on device once: the bench measures chip throughput, not
    # host->device tunnel bandwidth (12.6 MB/step at bs=256 otherwise)
    import jax

    x, y = jax.device_put(x), jax.device_put(y)

    df.manual_seed(0)

    def build_model():
        if model_name == "resnet18":
            return models.ResNet18(num_classes=10, small_input=True, device="tpu")
        return models.CIFAR10_CNN(device="tpu")

    compute_dtype = None
    if os.environ.get("BENCH_DTYPE", "f32") in ("bf16", "bfloat16"):
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16

    model = build_model()
    opt = optim.Adam(model.parameters(), lr=5e-3, weight_decay=5e-4)
    step = CompiledTrainStep(
        model, opt, nn.CrossEntropyLoss(), compute_dtype=compute_dtype
    )

    for _ in range(warmup):
        loss = step(x, y)
    _ = float(loss)  # sync
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = step(x, y)
    _ = float(loss)  # sync
    dt = time.perf_counter() - t0
    compiled_ips = batch_size * steps / dt

    vs_baseline = None
    if os.environ.get("BENCH_EAGER", "1") == "1":
        df.manual_seed(0)
        emodel = build_model()
        eopt = optim.Adam(emodel.parameters(), lr=5e-3, weight_decay=5e-4)
        crit = nn.CrossEntropyLoss()
        eager_steps = max(2, int(os.environ.get("BENCH_EAGER_STEPS", "3")))

        def eager_one():
            out = emodel(Tensor(x, device="tpu"))
            loss = crit(out, Tensor(y, device="tpu"))
            eopt.zero_grad()
            loss.backward()
            eopt.step()
            return float(loss.numpy())

        eager_one()  # warm per-op compile caches
        t0 = time.perf_counter()
        done = 0
        budget_s = float(os.environ.get("BENCH_EAGER_BUDGET_S", "120"))
        for _ in range(eager_steps):
            eager_one()
            done += 1
            if time.perf_counter() - t0 > budget_s:
                break  # keep the whole bench inside the driver's timeout
        dt = time.perf_counter() - t0
        eager_ips = batch_size * done / dt
        vs_baseline = round(compiled_ips / eager_ips, 2)

    print(
        json.dumps(
            {
                "metric": f"{model_name}_train_throughput",
                "value": round(compiled_ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": vs_baseline,
                "batch_size": batch_size,
                "steps": steps,
            }
        )
    )


if __name__ == "__main__":
    main()
