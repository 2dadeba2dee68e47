"""int8 weight-only decode regime hunt (round 4, r3 VERDICT item 9).

The r3 ladder showed int8 LOSING to bf16 at dim 512/depth 8 (26 M params,
B=16) and dim 1024/depth 16 (201 M, B=16): decode there is op-latency-
bound, not weight-bound.  The predicted int8 regime is B=1 decode on a
model big enough that weight bytes dominate the step.  This measures it:
B=1 (and B=4 for contrast) greedy decode on dim>=2048 models, bf16 vs
int8+bf16, whole-generation one-readback protocol, median of 3.

Usage: python tools/int8_regime.py [dim,depth,B,new_tokens ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(dim=2048, depth=16, B=1, new_tokens=256, prompt=32, vocab=1024,
        heads=16, max_len=512, repeats=3):
    import jax.numpy as jnp

    import deepflows_tpu as df
    from deepflows_tpu import models
    from deepflows_tpu.models import KVCacheDecoder

    df.manual_seed(0)
    lm = models.TransformerLM(
        vocab_size=vocab, max_len=max_len, dim=dim, depth=depth,
        num_heads=heads, device="tpu", flash=False,
    )
    n_params = sum(int(np.prod(p.shape)) for p in lm.parameters())
    rng = np.random.default_rng(0)
    idx = rng.integers(0, vocab, (B, prompt)).astype(np.int64)

    out = {"dim": dim, "depth": depth, "B": B, "params_m": round(n_params / 1e6),
           "new_tokens": new_tokens}
    modes = (("bf16", {"compute_dtype": jnp.bfloat16}),
             ("int8", {"compute_dtype": jnp.bfloat16, "quant": "int8"}),
             ("w8a8", {"compute_dtype": jnp.bfloat16, "quant": "w8a8"}))
    if os.environ.get("INT8_MODES"):
        want = set(os.environ["INT8_MODES"].split(","))
        modes = tuple(m for m in modes if m[0] in want)
    for name, kw in modes:
        dec = KVCacheDecoder(lm, **kw)
        _ = dec.generate(idx.copy(), new_tokens)  # compile warmup
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _ = dec.generate(idx.copy(), new_tokens)
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        out[name] = {
            "s_per_gen": round(med, 3),
            "tok_per_s": round(B * new_tokens / med, 1),
            "spread_pct": round(100 * (max(times) - min(times)) / med, 1),
        }
        del dec
    if "int8" in out and "bf16" in out:
        out["int8_over_bf16"] = round(
            out["int8"]["tok_per_s"] / out["bf16"]["tok_per_s"], 3)
    if "w8a8" in out and "bf16" in out:
        out["w8a8_over_bf16"] = round(
            out["w8a8"]["tok_per_s"] / out["bf16"]["tok_per_s"], 3)
    # weight-bound sanity: bytes of weights the decode loop streams per step
    out["weight_mb_per_step_bf16"] = round(2 * n_params / 1e6, 1)
    print(json.dumps(out), flush=True)
    return out


DEFAULT = ["2048,16,1,256", "2048,16,4,256", "2560,20,1,128"]

if __name__ == "__main__":
    for spec in (sys.argv[1:] or DEFAULT):
        dim, depth, B, nt = (int(t) for t in spec.split(","))
        try:
            run(dim=dim, depth=depth, B=B, new_tokens=nt)
        except Exception as e:
            print(json.dumps({"cfg": spec, "error": repr(e)[:300]}),
                  flush=True)
