"""Diff the framework LM train step against its raw-JAX twin at matched
naive-attention math (r4 VERDICT item 3): compile both on the live
backend and print XLA's own accounting — flops, bytes accessed, peak/temp
memory — so the ~1.3x gap decomposes into program facts instead of
guesses.

Usage: python tools/lm_twin_diff.py [dim depth heads vocab seqlen batch]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _report(name, compiled):
    out = {"program": name}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["flops"] = float(ca.get("flops", 0.0))
        out["bytes_accessed"] = float(ca.get("bytes accessed", 0.0))
        for k, v in ca.items():
            if k.startswith("bytes accessed") and "operand" not in k:
                out[k.replace(" ", "_")] = float(v)
    except Exception as e:
        out["cost_error"] = repr(e)[:120]
    try:
        ma = compiled.memory_analysis()
        for f in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            out[f] = getattr(ma, f, None)
    except Exception as e:
        out["mem_error"] = repr(e)[:120]
    print(json.dumps(out), flush=True)
    return out


def main(dim=1024, depth=12, heads=8, vocab=8192, seq=1024, batch=8):
    import jax
    import jax.numpy as jnp

    import deepflows_tpu as df
    from deepflows_tpu import models, nn, optim
    from deepflows_tpu.jit import CompiledTrainStep
    import rawjax_twin

    rng = np.random.default_rng(0)
    x = rng.integers(0, vocab, (batch, seq)).astype(np.int32)
    y = rng.integers(0, vocab, (batch, seq)).astype(np.int32)

    # framework, naive attention, plain CE (matched math)
    df.manual_seed(0)
    model = models.TransformerLM(
        vocab_size=vocab, max_len=seq, dim=dim, depth=depth,
        num_heads=heads, device="tpu", flash=False,
    )
    opt = optim.Adam(model.parameters(), lr=5e-3, weight_decay=5e-4)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(),
                             compute_dtype=jnp.bfloat16)
    pa = [p.data.array for p in step._params]
    ba = [b.data.array for b in step._buffers]
    fw = step._jitted.lower(
        pa, ba, opt._state, np.float32(opt.lr), np.int32(0), x, y
    ).compile()
    _report("framework_naive_bf16", fw)

    jitted, params, state, opt_state, xr, yr = rawjax_twin.make_train_step(
        "transformer_lm", batch, compute_dtype=jnp.bfloat16,
        lm_cfg={"seq_len": seq, "vocab": vocab, "dim": dim, "depth": depth,
                "heads": heads},
    )
    tw = jitted.lower(params, state, opt_state, np.int32(0), xr, yr).compile()
    _report("rawjax_twin_bf16", tw)


if __name__ == "__main__":
    a = [int(t) for t in sys.argv[1:]]
    main(*a)
