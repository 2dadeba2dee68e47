"""Ring attention: sequence parallelism where the sequence NEVER gathers.

``parallel/sequence.py``'s ShardConstraint is layout plumbing — GSPMD still
all-gathers the full sequence wherever attention needs it, so SP-as-shipped
reduced neither attention memory nor its FLOPs per device (r2 VERDICT).
This module is the real long-context capability: Q/K/V stay sharded on the
sequence dim over a mesh axis, each device computes blockwise online-softmax
attention of its LOCAL query chunk against the K/V chunk it currently
holds, and the K/V chunks rotate around the ring with ``lax.ppermute``
(one ICI hop per step, P steps total).  The softmax is exact — partial
(max, sum, accumulator) triples merge across steps exactly like
flash-attention's online softmax — and the full (L, L) score matrix never
exists on any device: peak per-device attention memory is the
``(Lc, Lc) = (L/P, L/P)`` block, P^2 x smaller than the gathered naive
scores (measured by AOT memory_analysis in tests/test_ring_attention.py).

Differentiable end to end: plain jnp + ``ppermute`` inside ``shard_map``
(ppermute's transpose is the reverse permute), so ``jax.grad`` — and the
tape via ``nn.jax_function`` — work without a hand-written backward.

Causal ring attention computes all P steps with chunks strictly above the
diagonal fully masked (predication, not skipped — SPMD programs are
uniform); the zigzag load-balanced schedule is a known follow-up.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

P = PartitionSpec


def ring_attention(
    q,
    k,
    v,
    mesh: Mesh,
    axis: str = "model",
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    batch_axis: Optional[str] = "data",
):
    """softmax(Q K^T * scale [+ causal]) V with Q/K/V (B, H, L, D) sharded
    on L over ``mesh`` axis ``axis``; the output keeps that sharding.

    L must divide by the axis size.  ``batch_axis`` (if present in the mesh)
    shards B as usual — ring steps only communicate over ``axis``.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}")
    nshards = mesh.shape[axis]
    b, h, length, d = q.shape
    if length % nshards:
        raise ValueError(f"sequence length {length} not divisible by {nshards}")
    scale = (1.0 / math.sqrt(d)) if sm_scale is None else float(sm_scale)
    ba = batch_axis if (batch_axis and batch_axis in mesh.axis_names) else None
    spec = P(ba, None, axis, None)

    local = functools.partial(
        _ring_local, axis=axis, nshards=nshards, scale=scale, causal=causal
    )
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def _ring_local(q, k, v, *, axis, nshards, scale, causal):
    """Per-device body: q/k/v are the LOCAL (B, H, Lc, D) chunks."""
    idx = jax.lax.axis_index(axis)
    bl, hl, lc, dl = q.shape
    qf = q.astype(jnp.float32)
    neg = jnp.float32(-1e30)
    m0 = jnp.full((bl, hl, lc, 1), neg, jnp.float32)
    l0 = jnp.zeros((bl, hl, lc, 1), jnp.float32)
    acc0 = jnp.zeros((bl, hl, lc, dl), jnp.float32)
    perm = [(i, (i + 1) % nshards) for i in range(nshards)]

    def step(carry, s):
        k_cur, v_cur, m, l, acc = carry
        # the chunk currently held started at device (idx - s) mod P
        src = (idx - s) % nshards
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale  # (B, H, Lc, Lc)
        if causal:
            qpos = idx * lc + jax.lax.broadcasted_iota(
                jnp.int32, (lc, lc), 0
            )
            kpos = src * lc + jax.lax.broadcasted_iota(
                jnp.int32, (lc, lc), 1
            )
            scores = jnp.where((kpos > qpos)[None, None], neg, scores)
        m_new = jnp.maximum(m, scores.max(-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l = l * alpha + p.sum(-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # rotate K/V one hop around the ring (ICI collective-permute)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (k_nxt, v_nxt, m_new, l, acc), None

    # lax.scan, not fori_loop: the ring must be reverse-differentiable
    # (fori_loop lowers to while_loop, which has no transpose)
    (_, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(nshards, dtype=jnp.int32)
    )
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (acc / l_safe).astype(q.dtype)
