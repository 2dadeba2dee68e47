"""On-chip config hunt for the transformer-LM benchmark row (round 4).

Times CompiledTrainStep on TransformerLM configs at seq >= 1024 (bf16,
flash attention, fused vs naive LM-head CE) with the sound tunnel protocol
(chained steps, ONE final host readback) and reports analytic MFU.

Analytic FLOPs (documented convention, since the fused-CE/flash programs
contain Pallas kernels that XLA's cost analysis cannot count):
  fwd matmul = 2*T*P_mat          (P_mat = depth*12*D^2: QKVO 4D^2 + MLP 8D^2)
  fwd head   = 2*T*D*V
  fwd attn   = depth*4*B*L^2*D    (PaLM-style full-quadratic convention;
                                   the causal-half variant is also reported)
  total      = 3x fwd (bwd = 2x fwd; flash/fused-CE recompute NOT counted,
               i.e. MFU counts model FLOPs, the standard convention)

Usage: python tools/lm_bench_hunt.py [config ...]
  config = dim,depth,heads,L,V,B,{fused|naive}[,f32]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def lm_flops(B, L, D, depth, V, causal_half=False):
    T = B * L
    f_mat = 2 * T * (depth * 12 * D * D)
    f_head = 2 * T * D * V
    f_att = depth * 4 * B * L * L * D
    if causal_half:
        f_att /= 2
    return 3.0 * (f_mat + f_head + f_att)


def run_config(dim, depth, heads, L, V, B, mode, dtype="bf16",
               steps=15, repeats=3, warmup=3, flash=True):
    import jax
    import jax.numpy as jnp

    import deepflows_tpu as df
    from deepflows_tpu import models, nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    df.manual_seed(0)
    lm = models.TransformerLM(
        vocab_size=V, max_len=L, dim=dim, depth=depth, num_heads=heads,
        device="tpu", flash=flash,
    )
    opt = optim.Adam(lm.parameters(), lr=1e-4)
    cd = jnp.bfloat16 if dtype == "bf16" else None
    if mode == "fused":
        step = CompiledTrainStep(
            lm.trunk(), opt, nn.LMHeadCrossEntropy(lm.head), compute_dtype=cd
        )
    else:
        step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss(), compute_dtype=cd)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, V, (B, L)).astype(np.int32))
    y = jax.device_put(rng.integers(0, V, (B, L)).astype(np.int32))

    t_compile = time.perf_counter()
    for _ in range(warmup):
        loss = step(x, y)
    lval = float(loss)
    t_compile = time.perf_counter() - t_compile

    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            loss = step(x, y)
        _ = float(loss)
        samples.append(B * steps / (time.perf_counter() - t0))
    med = statistics.median(samples)
    spread = 100.0 * (max(samples) - min(samples)) / med
    ms = 1000.0 * B / med
    fl = lm_flops(B, L, dim, depth, V)
    fl_c = lm_flops(B, L, dim, depth, V, causal_half=True)
    peak = 197e12
    out = {
        "cfg": f"d{dim}x{depth} h{heads} L{L} V{V} B{B} {mode} {dtype}"
               + ("" if flash else " noflash"),
        "seq_per_s": round(med, 1),
        "tok_per_s": round(med * L),
        "ms_per_step": round(ms, 1),
        "spread_pct": round(spread, 1),
        "mfu": round(fl * (med / B) / peak, 4),
        "mfu_causal": round(fl_c * (med / B) / peak, 4),
        "warmup_s": round(t_compile, 1),
        "loss": round(lval, 3),
        "samples": [round(s, 1) for s in samples],
    }
    print(json.dumps(out), flush=True)
    return out


DEFAULT = [
    "1024,12,16,1024,32768,16,fused",
    "1024,12,16,1024,32768,16,naive",
    "1024,12,16,1024,8192,16,fused",
    "1024,12,16,1024,8192,16,naive",
]

if __name__ == "__main__":
    specs = sys.argv[1:] or DEFAULT
    for spec in specs:
        parts = spec.split(",")
        dim, depth, heads, L, V, B = (int(p) for p in parts[:6])
        mode = parts[6]
        extra = parts[7:]
        dtype = "f32" if "f32" in extra else "bf16"
        flash = "noflash" not in extra
        try:
            run_config(dim, depth, heads, L, V, B, mode, dtype, flash=flash)
        except Exception as e:  # OOM on a naive config is itself a finding
            print(json.dumps({"cfg": spec, "error": repr(e)[:300]}), flush=True)
