"""Decode step-time accounting: where does the artifact decode row's
step go, and how far is it from its own HBM roofline?

The decode row (bench.py run_decode_row: TransformerLM d1024x12 h8 V8192,
B=8, prompt 64, +128 tokens, bf16) measures ~11.1k tok/s = ~0.72 ms/step,
while weights (336 MB) + KV reads (~75 MB) put the weight-streaming
roofline near 0.50 ms/step.  This tool attributes the gap by ablation,
exactly like tools/resnet_shares.py did for the conv flagship: each
variant is ONE fori_loop program of ``steps`` decode steps mirroring
KVCacheDecoder._forward_one (decoding.py:497), timed with chained calls
(carry stays on device, ONE readback per chain — the only sound protocol
through this tunnel, CLAUDE.md).  The roofline is ANALYTIC (weights + KV
+ head streamed per step): XLA's cost analysis counts a fori_loop body
ONCE, not per trip, so HLO flops/bytes are whole-program curiosities
here, unlike the unrolled train-step programs resnet_shares reads.

Variants (shares by subtraction):
  full        — the real decode step: QKV proj, cache write, attention
                over the cache, output proj, MLP, final LN + LM head
  no_head     — LM head ablated (logits = zeros): head share
  no_attn     — attention ablated (o = v_new): QK^T+softmax+AV share
  no_mlp      — MLP ablated: fc1/gelu/fc2 share
  no_write    — cache dynamic_update_slice ablated: write share
  no_attn_head— both ablated: the pure projection/MLP floor

Usage: python tools/decode_shares.py [batch] [steps]
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


def main(batch=8, steps=128):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import deepflows_tpu as df
    from deepflows_tpu import models
    from deepflows_tpu.models import KVCacheDecoder
    from deepflows_tpu.models.decoding import _invalid_keys, _mm

    prompt = 64
    lm_cfg = dict(dim=1024, depth=12, heads=8, vocab=8192)
    max_len = prompt + steps
    df.manual_seed(0)
    lm = models.TransformerLM(
        vocab_size=lm_cfg["vocab"], max_len=max_len, dim=lm_cfg["dim"],
        depth=lm_cfg["depth"], num_heads=lm_cfg["heads"], device="tpu",
        flash=False,
    )
    dec = KVCacheDecoder(lm, compute_dtype=jnp.bfloat16)
    params = dec._prep_jit(dec._gather())
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, lm_cfg["vocab"], (batch, prompt)).astype(np.int32)
    )
    pad = jnp.zeros((batch, max_len - prompt), jnp.int32)
    kc0, vc0, logits0 = dec._prefill_jit(
        params, jnp.concatenate([idx, pad], 1), prompt
    )
    tok0 = jnp.argmax(logits0, -1).astype(jnp.int32)
    H = lm.blocks[0].attn.num_heads
    scale = 1.0 / np.sqrt(lm.blocks[0].attn.head_dim)
    positions = jnp.arange(max_len)

    def forward_one(params, kc, vc, tok, pos, *, attn, mlp, head, write):
        """KVCacheDecoder._forward_one (decoding.py:497) with ablation
        flags; identical math when all flags are True."""
        x = params["tok"][tok][:, None, :] + lax.dynamic_slice(
            params["pos"], (0, pos, 0), (1, 1, params["pos"].shape[2])
        )
        invalid = _invalid_keys(positions[None, None, None, :], pos, None)
        for li, p in enumerate(params["blocks"]):
            h = dec._ln(x, p["ln1_w"], p["ln1_b"])
            q, k_new, v_new = dec._attn_proj(h, p, H)
            if write:
                kc = lax.dynamic_update_slice(
                    kc, k_new[None], (li, 0, 0, pos, 0))
                vc = lax.dynamic_update_slice(
                    vc, v_new[None], (li, 0, 0, pos, 0))
            if attn:
                s = (jnp.einsum("bhqd,bhkd->bhqk", q, kc[li]) * scale
                     ).astype(jnp.float32)
                s = jnp.where(invalid, -1e30, s)
                a = jax.nn.softmax(s, -1).astype(vc.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", a, vc[li])
            else:
                o = v_new + 0.0 * q  # keep q live
            o = o.transpose(0, 2, 1, 3).reshape(tok.shape[0], 1, -1)
            x = x + (_mm(o, p["o_w"]) + p["o_b"])
            if mlp:
                x = x + dec._mlp(dec._ln(x, p["ln2_w"], p["ln2_b"]), p)
        x = dec._ln(x, params["lnf_w"], params["lnf_b"])
        if head:
            return dec._head(x[:, 0], params), kc, vc
        return (
            jnp.zeros((tok.shape[0], lm_cfg["vocab"]), jnp.float32)
            + x[:, 0, :1], kc, vc,
        )

    def make_runner(**flags):
        def run(params, kc, vc, tok, pos0):
            def step(i, carry):
                kc, vc, tok, pos = carry
                logits, kc, vc = forward_one(
                    params, kc, vc, tok, pos, **flags)
                return kc, vc, jnp.argmax(logits, -1).astype(jnp.int32), pos + 1
            kc, vc, tok, _ = lax.fori_loop(
                0, steps, step, (kc, vc, tok, pos0))
            return kc, vc, tok
        return jax.jit(run, donate_argnums=(1, 2))

    variants = [
        ("full", dict(attn=True, mlp=True, head=True, write=True)),
        ("no_head", dict(attn=True, mlp=True, head=False, write=True)),
        ("no_attn", dict(attn=False, mlp=True, head=True, write=True)),
        ("no_mlp", dict(attn=True, mlp=False, head=True, write=True)),
        ("no_write", dict(attn=True, mlp=True, head=True, write=False)),
        ("no_attn_head", dict(attn=False, mlp=True, head=False, write=True)),
    ]

    pos0 = jnp.int32(prompt)
    chains, repeats = 8, 3
    rows = {}
    for name, flags in variants:
        run = make_runner(**flags)
        lowered = run.lower(params, kc0, vc0, tok0, pos0)
        compiled = lowered.compile()
        flops, byts = _cost(compiled)
        # donate copies — kc0/vc0 must survive for the next variant
        kc, vc, tok = compiled(params, jnp.copy(kc0), jnp.copy(vc0),
                               tok0, pos0)
        _ = np.asarray(tok)  # warm sync
        ts = []
        for _ in range(repeats):
            kc, vc = jnp.copy(kc), jnp.copy(vc)
            t0 = time.perf_counter()
            for _ in range(chains):
                kc, vc, tok = compiled(params, kc, vc, tok, pos0)
            _ = (np.asarray(tok), np.asarray(kc[0, 0, 0, 0, :1]))
            ts.append(
                1000.0 * (time.perf_counter() - t0) / (chains * steps))
        med = statistics.median(ts)
        row = {
            "ms_per_step": round(med, 4),
            "samples_ms": [round(t, 4) for t in ts],
        }
        if flops:
            # CAVEAT: XLA's cost analysis counts the fori_loop BODY once
            # (trip count is not multiplied in), so these are whole-program
            # numbers useful only for relative comparison — the real
            # per-step traffic is the analytic streaming estimate printed
            # in the summary (weights + KV + head per decode step).
            row["hlo_gflop_program"] = round(flops / 1e9, 2)
            row["hlo_mb_program"] = round(byts / 1e6, 1)
        rows[name] = row
        print(name, json.dumps(row), flush=True)

    full = rows["full"]["ms_per_step"]
    shares = {
        "head_ms": round(full - rows["no_head"]["ms_per_step"], 4),
        "attention_ms": round(full - rows["no_attn"]["ms_per_step"], 4),
        "mlp_ms": round(full - rows["no_mlp"]["ms_per_step"], 4),
        "cache_write_ms": round(full - rows["no_write"]["ms_per_step"], 4),
        "proj_floor_ms": rows["no_attn_head"]["ms_per_step"],
        "full_ms": full,
    }
    # analytic per-step streaming roofline (what every decode step must
    # move through HBM): all weights once (bf16), both KV caches of the
    # mean live length, this step's K/V write, plus the f32 logits write
    D = lm_cfg["dim"]
    blk_w = lm_cfg["depth"] * 12 * D * D          # qkv 3 + o 1 + mlp 8
    head_w = D * lm_cfg["vocab"]
    mean_len = prompt + steps / 2.0
    kv_read = 2 * batch * mean_len * D            # H*Dh == dim
    stream_bytes = 2.0 * (blk_w + head_w + batch * D + kv_read) + (
        2 * 2 * batch * D                          # K/V write, bf16
        + 4 * batch * lm_cfg["vocab"]              # f32 logits
    )
    roofline = {
        "streaming_mb_per_step": round(stream_bytes / 1e6, 1),
        "t_roofline_ms": round(stream_bytes / PEAK_BW * 1e3, 4),
        "pct_of_roofline": round(
            100.0 * (stream_bytes / PEAK_BW * 1e3) / full, 1),
    }
    out = {
        "config": {"batch": batch, "steps": steps, "prompt": prompt,
                   **lm_cfg, "max_len": max_len, "dtype": "bf16"},
        "rows": rows, "shares_by_subtraction": shares,
        "analytic_roofline": roofline,
        "device": str(jax.devices()[0].device_kind),
        "protocol": f"{chains}-call chains x {steps}-step fori_loop "
                    f"programs, one readback per chain, median of {repeats}",
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    main(b, s)
