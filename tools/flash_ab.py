"""On-chip flash-vs-naive attention A/B at short L (round 4).

Re-measures the r3 crossover table (BENCH_NOTES "Flash attention") after
the head-packed single-block fast path landed in ops/pallas_kernels:
end-to-end TransformerLM train step (dim 512, heads 8, bf16), flash=True
vs flash=False, timed INTERLEAVED (A/B per round, ratio = median of
per-round ratios) with the chained-readback protocol — the same shape the
r3 table used, plus pairing.

Usage: python tools/flash_ab.py [L,B[,steps] ...]   default: the r3 grid.
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


def run_pair(L, B, steps=100, repeats=3, warmup=3, dim=512, depth=6,
             heads=8, vocab=256):
    import jax
    import jax.numpy as jnp

    import deepflows_tpu as df
    from deepflows_tpu import models, nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, vocab, (B, L)).astype(np.int32))
    y = jax.device_put(rng.integers(0, vocab, (B, L)).astype(np.int32))

    steps_by_flash = {}
    for flash in (True, False):
        df.manual_seed(0)
        lm = models.TransformerLM(
            vocab_size=vocab, max_len=L, dim=dim, depth=depth,
            num_heads=heads, device="tpu", flash=flash,
        )
        opt = optim.Adam(lm.parameters(), lr=1e-3)
        st = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss(),
                               compute_dtype=jnp.bfloat16)
        for _ in range(warmup):
            loss = st(x, y)
        _ = float(loss)
        steps_by_flash[flash] = st

    def chain(st):
        t0 = time.perf_counter()
        for _ in range(steps):
            loss = st(x, y)
        _ = float(loss)
        return B * steps / (time.perf_counter() - t0)

    fs, ns, ratios = [], [], []
    for _ in range(repeats):
        fs.append(chain(steps_by_flash[True]))
        ns.append(chain(steps_by_flash[False]))
        ratios.append(fs[-1] / ns[-1])
    out = {
        "L": L, "B": B, "steps": steps,
        "flash_ips": round(statistics.median(fs), 1),
        "naive_ips": round(statistics.median(ns), 1),
        "flash_over_naive": round(statistics.median(ratios), 3),
        "ratios": [round(r, 3) for r in ratios],
        "spread_flash_pct": round(
            100 * (max(fs) - min(fs)) / statistics.median(fs), 1),
    }
    print(json.dumps(out), flush=True)
    return out


DEFAULT = ["128,64", "256,64", "512,32", "1024,32"]

if __name__ == "__main__":
    for spec in (sys.argv[1:] or DEFAULT):
        p = [int(t) for t in spec.split(",")]
        L, B = p[0], p[1]
        steps = p[2] if len(p) > 2 else (100 if L <= 512 else 50)
        try:
            run_pair(L, B, steps=steps)
        except Exception as e:
            print(json.dumps({"cfg": spec, "error": repr(e)[:300]}),
                  flush=True)
