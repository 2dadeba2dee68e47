"""Conv→BN folding inference A/B on the real chip.

nn.fusion.fuse_conv_bn folds eval-mode BatchNorm into the preceding convs
(BENCH_NOTES "NF-ResNet50" names BN as 37% of the memory-bound TRAIN step;
this tool measures what folding buys the SERVING path, where the fold is
exact rather than an architecture change).

Protocol: the sound tunnel protocol (tools/resnet_shares.py) — compiled
eval forward, 30-step chains with one readback, median of 3, each program
with its own compiled HLO flops/bytes and v5e rooflines.  Correctness is
checked ON CHIP first: fused-vs-unfused logits in f32 must agree to 1e-3
before the bf16 timing rows run.

Usage: python tools/fuse_infer.py [batch] [image]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TF = 197e12
PEAK_BW = 819e9


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def _chain(fn, steps=30, repeats=3):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn()
        _ = np.asarray(out).ravel()[0]
        ts.append(1000.0 * (time.perf_counter() - t0) / steps)
    return statistics.median(ts), ts


def main(batch=128, image=224):
    import jax

    import deepflows_tpu as df
    from deepflows_tpu import models
    from deepflows_tpu.jit import CompiledEvalStep
    from deepflows_tpu.nn.fusion import fuse_conv_bn

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((batch, 3, image, image)).astype(np.float32)
    )

    def build():
        # build + fuse on the numpy device (the fold trace is one EAGER
        # forward — on the tunnel that is minutes, on numpy milliseconds),
        # then CompiledEvalStep moves params to the chip
        df.manual_seed(0)
        m = models.ResNet50(num_classes=10, small_input=False, device="cpu")
        # non-trivial running stats so the fold is not a no-op affine
        m.train()
        warm = df.Tensor(
            rng.standard_normal((4, 3, image, image)).astype(np.float32) * 1.5
            + 0.2,
            device="cpu",
        )
        m(warm)
        m.eval()
        return m

    rows = []

    def row(name, ms, flops, bts, samples):
        r = {
            "program": name,
            "ms_per_step": round(ms, 2),
            "img_per_s": round(batch / (ms / 1000.0), 1),
            "samples_ms": [round(s, 2) for s in samples],
            "hlo_tflop": round(flops / 1e12, 3) if flops else None,
            "hlo_gb": round(bts / 1e9, 2) if bts else None,
            "roofline_mem_ms": round(1000 * bts / PEAK_BW, 2) if bts else None,
            "roofline_mxu_ms": round(1000 * flops / PEAK_TF, 2) if flops else None,
            "mfu": round(flops / (ms / 1000) / PEAK_TF, 4) if flops else None,
        }
        rows.append(r)
        print(json.dumps(r), flush=True)
        return r

    # ---- correctness on chip (f32): fused must match unfused eval logits
    base = build()
    fused = fuse_conv_bn(base, np.zeros((2, 3, image, image), np.float32))
    n_bn = sum(
        1 for _, m in fused.named_modules()
        if type(m).__name__.startswith("BatchNorm")
    )
    assert n_bn == 0, f"{n_bn} BatchNorms survived the fold"
    ev_b = CompiledEvalStep(base)
    ev_f = CompiledEvalStep(fused)
    xs = x[:8]
    yb = np.asarray(ev_b(xs))
    yf = np.asarray(ev_f(xs))
    err = float(np.max(np.abs(yb - yf)) / (np.max(np.abs(yb)) + 1e-9))
    print(json.dumps({"onchip_f32_rel_err": err}), flush=True)
    # TPU lowers f32 convs through bf16 MXU passes by default, so the folded
    # weights round differently through 50 layers (~0.4% observed); the exact
    # f32 fold is asserted at 2e-4 on the numpy backend (tests/test_fusion.py)
    assert err < 1e-2, f"fused logits diverge on chip: rel err {err}"

    # ---- bf16 timing rows (the production serving dtype)
    for name, model in (("eval_unfused", build()),
                        ("eval_fused", fuse_conv_bn(
                            build(), np.zeros((2, 3, image, image), np.float32)))):
        model.bfloat16()
        ev = CompiledEvalStep(model)
        pa = [p.data.array for p in ev._params]
        ba = [b.data.array for b in ev._buffers]
        import jax.numpy as jnp

        xb = x.astype(jnp.bfloat16)
        f, b = _cost(ev._jitted.lower(pa, ba, xb).compile())
        ms, s = _chain(lambda: ev._jitted(pa, ba, xb))
        row(name + "_bf16", ms, f, b, s)

    if len(rows) == 2 and rows[0]["ms_per_step"]:
        print(json.dumps({
            "speedup": round(rows[0]["ms_per_step"] / rows[1]["ms_per_step"], 3),
            "batch": batch, "image": image,
        }), flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    im = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    main(b, im)
