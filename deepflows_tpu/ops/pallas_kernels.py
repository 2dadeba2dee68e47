"""Hand-written Pallas TPU kernels for the hot ops.

The reference's hot loops are a naive TILE=4 CUDA matmul, an im2col slice
loop, and per-op elementwise launches (SURVEY §3.1).  On TPU the compiled
whole-step path already fuses elementwise chains into XLA's MXU matmuls/
convs, so these kernels target the remaining wins and serve as the
from-scratch kernel layer the framework owns:

- ``matmul``: MXU-tiled (128×128×K-block) f32 matmul with a VMEM accumulator
  (routes eager 2-D BackendTensor matmuls when ``config.use_pallas`` is on,
  `backend/jax_kernels.py`).
- ``linear_fused``: y = act(x @ W + b) in ONE kernel — the eager-mode Linear
  fast path behind ``config.use_pallas`` (`nn/functional.linear`).
- ``fused_adam``: whole-parameter Adam update in one VPU kernel over the
  raveled parameter — opt-in via ``optim.Adam(..., fused=True)``.

All kernels run under ``interpret=True`` off-TPU so the unit tests cover
them on CPU; on a TPU backend they compile via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------------ matmul
def matmul_supported(a, b) -> bool:
    return (
        a.ndim == 2
        and b.ndim == 2
        and a.dtype == jnp.float32
        and b.dtype == jnp.float32
        and a.shape[1] == b.shape[0]
    )


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref, *, k_steps):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "tile_k"))
def matmul(a, b, tile_m: int = 128, tile_n: int = 128, tile_k: int = 256):
    """MXU-tiled matmul with K-accumulation in a VMEM scratch buffer.
    Pads to tile multiples (XLA slices the result back)."""
    m, k = a.shape
    _, n = b.shape
    mp, kp, np_ = _round_up(m, tile_m), _round_up(k, tile_k), _round_up(n, tile_n)
    a_p = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    b_p = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    k_steps = kp // tile_k
    grid = (mp // tile_m, np_ // tile_n, k_steps)
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, k_steps=k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, tile_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, tile_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=4 * (mp * kp + kp * np_ + mp * np_),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a_p, b_p)
    return out[:m, :n]


# ------------------------------------------------------------------ fused linear
def _linear_kernel(x_ref, w_ref, b_ref, out_ref, acc_ref, *, k_steps, activation):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == k_steps - 1)
    def _():
        y = acc_ref[:] + b_ref[:]
        if activation == "relu":
            y = jnp.maximum(y, 0.0)
        elif activation == "tanh":
            y = jnp.tanh(y)
        out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("activation", "tile_m", "tile_n", "tile_k"))
def linear_fused(
    x,
    w,
    b,
    activation: str = "none",
    tile_m: int = 128,
    tile_n: int = 128,
    tile_k: int = 256,
):
    """act(x @ w + b) in one Pallas kernel.  x: (M,K), w: (K,N), b: (1,N)."""
    m, k = x.shape
    _, n = w.shape
    mp, kp, np_ = _round_up(m, tile_m), _round_up(k, tile_k), _round_up(n, tile_n)
    x_p = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    w_p = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    b_p = jnp.pad(b.reshape(1, -1), ((0, 0), (0, np_ - n)))
    k_steps = kp // tile_k
    grid = (mp // tile_m, np_ // tile_n, k_steps)
    out = pl.pallas_call(
        functools.partial(_linear_kernel, k_steps=k_steps, activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, tile_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, tile_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        interpret=_interpret(),
    )(x_p, w_p, b_p)
    return out[:m, :n]


# ------------------------------------------------------------------ fused adam
def _adam_kernel(p_ref, g_ref, v_ref, s_ref, h_ref, p_out, v_out, s_out):
    lr = h_ref[0]
    beta1, beta2 = h_ref[1], h_ref[2]
    eps, wd = h_ref[3], h_ref[4]
    bc1, bc2 = h_ref[5], h_ref[6]
    g = g_ref[:] + p_ref[:] * wd
    v = v_ref[:] * beta1 + g * (1.0 - beta1)
    s = s_ref[:] * beta2 + g * g * (1.0 - beta2)
    v_out[:] = v
    s_out[:] = s
    p_out[:] = p_ref[:] - lr * (v / bc1) / (jnp.sqrt(s / bc2) + eps)


@jax.jit
def fused_adam(p, g, v, s, hyper):
    """One-kernel Adam over a raveled parameter.

    hyper: f32[7] = [lr, beta1, beta2, eps, weight_decay, 1-beta1^t, 1-beta2^t]
    Returns (new_p, new_v, new_s)."""
    shape = p.shape
    n = p.size
    lanes = 128 * 8
    npad = _round_up(max(n, lanes), lanes)
    pad = lambda a: jnp.pad(a.reshape(-1), (0, npad - n)).reshape(npad // 128, 128)
    p2, g2, v2, s2 = pad(p), pad(g), pad(v), pad(s)
    new_p, new_v, new_s = pl.pallas_call(
        _adam_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(p2.shape, jnp.float32),
            jax.ShapeDtypeStruct(p2.shape, jnp.float32),
            jax.ShapeDtypeStruct(p2.shape, jnp.float32),
        ),
        interpret=_interpret(),
    )(p2, g2, v2, s2, hyper)
    unpad = lambda a: a.reshape(-1)[:n].reshape(shape)
    return unpad(new_p), unpad(new_v), unpad(new_s)


# ------------------------------------------------- stochastic-rounding adam
def _stochastic_round_bf16(x_f32, random_bits_u32):
    """Unbiased f32 -> bf16 stochastic rounding via the mantissa bit trick:
    add the 16 discarded mantissa bits' worth of randomness, then truncate.
    (This is the same math ``pltpu.stochastic_round`` performs; written out
    so the kernel also runs in interpret mode, where that primitive has no
    CPU lowering in this JAX version.)"""
    xi = jax.lax.bitcast_convert_type(x_f32, jnp.uint32)
    xi = xi + (random_bits_u32 & jnp.uint32(0xFFFF))
    xi = xi & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(xi, jnp.float32).astype(jnp.bfloat16)


def _adam_sr_math(p_ref, g_ref, v_ref, s_ref, h_ref, p_out, v_out, s_out, bits):
    lr = h_ref[0]
    beta1, beta2 = h_ref[1], h_ref[2]
    eps, wd = h_ref[3], h_ref[4]
    bc1, bc2 = h_ref[5], h_ref[6]
    p32 = p_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32) + p32 * wd
    v = v_ref[:] * beta1 + g * (1.0 - beta1)
    s = s_ref[:] * beta2 + g * g * (1.0 - beta2)
    v_out[:] = v
    s_out[:] = s
    new_p = p32 - lr * (v / bc1) / (jnp.sqrt(s / bc2) + eps)
    p_out[:] = _stochastic_round_bf16(new_p, bits)


def _adam_sr_kernel_tpu(seed_ref, p_ref, g_ref, v_ref, s_ref, h_ref, p_out, v_out, s_out):
    # in-kernel PRNG: the random bits never touch HBM (a fusion XLA cannot
    # express -- threefry output would be materialized between programs).
    # per-grid-block seed offset keeps blocks' bit streams independent
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(p_ref.shape), jnp.uint32)
    _adam_sr_math(p_ref, g_ref, v_ref, s_ref, h_ref, p_out, v_out, s_out, bits)


def _adam_sr_kernel_bits(seed_ref, bits_ref, p_ref, g_ref, v_ref, s_ref, h_ref, p_out, v_out, s_out):
    # interpret-mode twin: pltpu.prng_random_bits is stubbed to zeros off-TPU
    # in this JAX version, so tests feed externally generated threefry bits
    _adam_sr_math(p_ref, g_ref, v_ref, s_ref, h_ref, p_out, v_out, s_out, bits_ref[:])


@jax.jit
def fused_adam_sr(p, g, v, s, hyper, seed):
    """Adam update with STOCHASTIC ROUNDING of the new parameter to bf16 --
    the TPU-native enabler for full-bf16 weight training: deterministic
    round-to-nearest of tiny updates into bf16's 8 mantissa bits silently
    zeroes them (the update stalls once |update| < ulp/2); unbiased
    stochastic rounding preserves the EXPECTED update.  On TPU the random
    bits come from the in-kernel hardware PRNG fused with the update (no
    XLA/jnp equivalent -- VERDICT r1 item 9's "kernel XLA can't trivially
    match"); in interpret mode (CPU tests) the same math runs with external
    threefry bits.

    p: bf16 parameter; g: grad (any float dtype); v/s: f32 moments;
    hyper: f32[7] = [lr, b1, b2, eps, wd, 1-b1^t, 1-b2^t]; seed: int32[1].
    Returns (new_p bf16, new_v f32, new_s f32)."""
    shape = p.shape
    n = p.size
    # grid-block over rows so VMEM stays bounded for ResNet-scale params:
    # per block, 4 f32 + bf16/bf16 buffers of (BLOCK_ROWS, 128) ≈ 1.8 MB
    BLOCK_ROWS = 512  # multiple of 16 (bf16 min sublane tile)
    lanes = 128 * 16
    npad = _round_up(max(n, lanes), lanes)
    rows = npad // 128
    nblocks = pl.cdiv(rows, BLOCK_ROWS)
    rows_padded = nblocks * BLOCK_ROWS
    npad = rows_padded * 128

    def pad(a, dtype):
        return (
            jnp.pad(a.reshape(-1).astype(dtype), (0, npad - n))
            .reshape(rows_padded, 128)
        )

    p2 = pad(p, jnp.bfloat16)
    g2, v2, s2 = pad(g, jnp.float32), pad(v, jnp.float32), pad(s, jnp.float32)
    out_shape = (
        jax.ShapeDtypeStruct(p2.shape, jnp.bfloat16),
        jax.ShapeDtypeStruct(p2.shape, jnp.float32),
        jax.ShapeDtypeStruct(p2.shape, jnp.float32),
    )
    # index_map receives the scalar-prefetch refs after the grid indices
    blk = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i, *_refs: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if not _interpret():
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[blk, blk, blk, blk, smem],
            out_specs=(blk, blk, blk),
        )
        new_p, new_v, new_s = pl.pallas_call(
            _adam_sr_kernel_tpu, grid_spec=grid_spec, out_shape=out_shape
        )(seed, p2, g2, v2, s2, hyper)
    else:
        bits = jax.random.bits(jax.random.PRNGKey(seed[0]), p2.shape, jnp.uint32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[blk, blk, blk, blk, blk, smem],
            out_specs=(blk, blk, blk),
        )
        new_p, new_v, new_s = pl.pallas_call(
            _adam_sr_kernel_bits,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=pltpu.InterpretParams(),
        )(seed, bits, p2, g2, v2, s2, hyper)
    unpad = lambda a, dt: a.reshape(-1)[:n].reshape(shape).astype(dt)
    return unpad(new_p, jnp.bfloat16), unpad(new_v, jnp.float32), unpad(new_s, jnp.float32)


# ------------------------------------------------- int8 weight-only matmul
# Weight-only int8 quantization for the memory-bound decode path: weights
# are stored int8 with a per-output-channel f32 scale (w ≈ q * s[col]) and
# DEQUANTIZED INSIDE THE MATMUL KERNEL's K-loop, so HBM weight traffic is
# 1 byte/param instead of 2 (bf16) or 4 (f32).  XLA cannot express this
# fusion in an autoregressive decode loop: `x @ (q.astype(bf16) * s)` is
# loop-invariant, so XLA hoists the dequantized COPY out of the fori_loop
# and streams the full-width weights every step — erasing the win.  Here
# the int8 tile is widened in VMEM after the DMA, and the per-channel scale
# is applied ONCE to the f32 accumulator at the last K step (exact: s[n]
# distributes over the K sum).


def quantize_int8(w):
    """Per-output-channel symmetric int8 quantization of a (K, N) weight.
    Returns (q int8 (K, N), scale f32 (N,)) with q * scale ≈ w."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.where(a == 0.0, 1.0, a / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _int8_matmul_kernel(x_ref, wq_ref, s_ref, out_ref, acc_ref, *, k_steps):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # widen the int8 tile to the activation dtype in VMEM (the DMA moved
    # only 1 byte/elem); |q| <= 127 is exact in bf16's 8 mantissa bits
    acc_ref[:] += jax.lax.dot(
        x_ref[:], wq_ref[:].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == k_steps - 1)
    def _():
        out_ref[:] = (acc_ref[:] * s_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tile_m", "tile_n", "tile_k")
)
def int8_matmul(
    x, wq, scale, out_dtype=None,
    tile_m: int = 128, tile_n: int = 256, tile_k: int = 256,
):
    """x @ (wq * scale[col]) with in-kernel dequantization.

    x: (M, K) f32/bf16; wq: (K, N) int8; scale: (N,) f32.  Accumulates f32
    and applies the per-channel scale once at the end, so the result equals
    the dequantized matmul exactly (modulo f32 summation order).  M is
    padded to the dtype's sublane tile (decode uses M = batch, e.g. 16);
    K tiles are 32-multiples (the int8 sublane tile)."""
    m, k = x.shape
    _, n = wq.shape
    out_dtype = jnp.dtype(x.dtype if out_dtype is None else out_dtype)
    tile_m = min(tile_m, _round_up(m, 32))
    mp = _round_up(m, tile_m)
    kp = _round_up(k, tile_k)
    np_ = _round_up(n, tile_n)
    x_p = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    w_p = jnp.pad(wq, ((0, kp - k), (0, np_ - n)))
    s_p = jnp.pad(scale.reshape(1, -1), ((0, 0), (0, np_ - n)))
    k_steps = kp // tile_k
    grid = (mp // tile_m, np_ // tile_n, k_steps)
    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, k_steps=k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, tile_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, tile_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=x.dtype.itemsize * mp * kp
            + kp * np_
            + out_dtype.itemsize * mp * np_,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_p, w_p, s_p)
    return out[:m, :n]


# ---------------------------------------------- fused linear cross-entropy
# LM-head loss WITHOUT materializing the (N, V) logits: the classic
# large-vocab memory cliff (N=B*L rows x 32k-256k vocab of f32 logits +
# softmax dwarfs every other activation).  The forward streams vocab tiles
# through an online-softmax (running max / sum-exp, exactly the flash
# recipe applied to the class axis) while gathering each row's target
# logit; only the per-row loss and log-sum-exp (N,) leave the kernel.  The
# backward recomputes each logits tile from (x, w, lse) and contracts it
# immediately: dx accumulates over vocab tiles, dw/db over row tiles —
# softmax probabilities never hit HBM either.

_FLCE_BV = 512  # vocab tile (f32 logits tile 128 x 512 = 256 KiB of VMEM)


def _flce_fwd_kernel(
    x_ref, w_ref, b_ref, t_ref, loss_ref, lse_ref, m_ref, l_ref, s_ref,
    *, nv, bv, vocab,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        s_ref[:] = jnp.zeros_like(s_ref)

    logits = jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ) + b_ref[:]  # (bm, bv) f32
    bm = logits.shape[0]
    kpos = j * bv + jax.lax.broadcasted_iota(jnp.int32, (bm, bv), 1)
    logits = jnp.where(kpos >= vocab, _NEG_INF, logits)  # padded vocab tail
    tgt = t_ref[:, 0:1]  # (bm, 1) int32
    s_ref[:] += jnp.broadcast_to(
        jnp.sum(jnp.where(kpos == tgt, logits, 0.0), axis=1, keepdims=True),
        s_ref.shape,
    )
    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    l_cur = l_prev * jnp.exp(m_prev - m_cur) + jnp.sum(
        jnp.exp(logits - m_cur), axis=1, keepdims=True
    )
    m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_cur, l_ref.shape)

    @pl.when(j == nv - 1)
    def _():
        lse = m_ref[:, 0:1] + jnp.log(l_ref[:, 0:1])
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)
        loss_ref[:] = jnp.broadcast_to(lse - s_ref[:, 0:1], loss_ref.shape)


def _flce_dx_kernel(
    x_ref, w_ref, b_ref, t_ref, lse_ref, g_ref, dx_ref, dx_acc,
    *, nv, bv, vocab,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dx_acc[:] = jnp.zeros_like(dx_acc)

    logits = jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ) + b_ref[:]
    bm = logits.shape[0]
    kpos = j * bv + jax.lax.broadcasted_iota(jnp.int32, (bm, bv), 1)
    p = jnp.where(
        kpos >= vocab, 0.0, jnp.exp(logits - lse_ref[:, 0:1])
    )  # softmax tile
    dl = (p - (kpos == t_ref[:, 0:1]).astype(jnp.float32)) * g_ref[:, 0:1]
    dx_acc[:] += jax.lax.dot_general(
        dl.astype(w_ref.dtype), w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bm, D)

    @pl.when(j == nv - 1)
    def _():
        dx_ref[:] = dx_acc[:].astype(dx_ref.dtype)


def _flce_dw_kernel(
    x_ref, w_ref, b_ref, t_ref, lse_ref, g_ref, dw_ref, db_ref,
    dw_acc, db_acc, *, ni, bv, vocab,
):
    # grid (nj, ni): row tiles iterate fastest, one (dw, db) tile per j
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        db_acc[:] = jnp.zeros_like(db_acc)

    logits = jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ) + b_ref[:]
    bm = logits.shape[0]
    kpos = j * bv + jax.lax.broadcasted_iota(jnp.int32, (bm, bv), 1)
    p = jnp.where(kpos >= vocab, 0.0, jnp.exp(logits - lse_ref[:, 0:1]))
    dl = (p - (kpos == t_ref[:, 0:1]).astype(jnp.float32)) * g_ref[:, 0:1]
    dw_acc[:] += jax.lax.dot_general(
        x_ref[:], dl.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, bv)
    db_acc[:] += jnp.broadcast_to(
        jnp.sum(dl, axis=0, keepdims=True), db_acc.shape
    )  # every sublane accumulates the same (1, bv) row

    @pl.when(i == ni - 1)
    def _():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        db_ref[:] = db_acc[0:1].astype(db_ref.dtype)


def _flce_pads(x, w, b, t, g, bm, bv):
    n, d = x.shape
    vocab = w.shape[1]
    np_, vp = _round_up(n, bm), _round_up(vocab, bv)
    x_p = jnp.pad(x, ((0, np_ - n), (0, 0)))
    w_p = jnp.pad(w, ((0, 0), (0, vp - vocab)))
    b_p = jnp.pad(b.reshape(1, -1), ((0, 0), (0, vp - vocab)))
    # padded rows target class 0 of an all -inf row: loss garbage, sliced off
    t_p = jnp.pad(t.astype(jnp.int32), (0, np_ - n)).reshape(-1, 1)
    t_p = jnp.broadcast_to(t_p, (np_, _LSE_LANES))
    parts = [x_p, w_p, b_p, t_p]
    if g is not None:
        g_p = jnp.pad(g.astype(jnp.float32), (0, np_ - n)).reshape(-1, 1)
        parts.append(jnp.broadcast_to(g_p, (np_, _LSE_LANES)))
    return parts, np_, vp, vocab


def _flce_fwd_impl(x, w, b, t, bm, bv):
    n, d = x.shape
    (x_p, w_p, b_p, t_p), np_, vp, vocab = _flce_pads(x, w, b, t, None, bm, bv)
    ni, nv = np_ // bm, vp // bv
    row = pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    wv = pl.BlockSpec((d, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    lanes = pl.BlockSpec(
        (bm, _LSE_LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    loss, lse = pl.pallas_call(
        functools.partial(_flce_fwd_kernel, nv=nv, bv=bv, vocab=vocab),
        grid=(ni, nv),
        in_specs=[row, wv, bias, lanes],
        out_specs=(lanes, lanes),
        out_shape=(
            jax.ShapeDtypeStruct((np_, _LSE_LANES), jnp.float32),
            jax.ShapeDtypeStruct((np_, _LSE_LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, 128), jnp.float32),
            pltpu.VMEM((bm, 128), jnp.float32),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d * vp,
            bytes_accessed=4 * (np_ * d + d * vp + 2 * np_),
            transcendentals=np_ * vp,
        ),
        interpret=_interpret(),
    )(x_p, w_p, b_p, t_p)
    return loss[:n, 0], lse[:n, 0]


def _flce_bwd_impl(x, w, b, t, lse, g, bm, bv):
    n, d = x.shape
    (x_p, w_p, b_p, t_p, g_p), np_, vp, vocab = _flce_pads(
        x, w, b, t, g, bm, bv
    )
    lse_p = jnp.pad(lse, (0, np_ - n)).reshape(-1, 1)
    lse_p = jnp.broadcast_to(lse_p, (np_, _LSE_LANES))
    ni, nv = np_ // bm, vp // bv
    row = pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    wv = pl.BlockSpec((d, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    lanes = pl.BlockSpec(
        (bm, _LSE_LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    dx = pl.pallas_call(
        functools.partial(_flce_dx_kernel, nv=nv, bv=bv, vocab=vocab),
        grid=(ni, nv),
        in_specs=[row, wv, bias, lanes, lanes, lanes],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, d), jnp.float32)],
        interpret=_interpret(),
    )(x_p, w_p, b_p, t_p, lse_p, g_p)
    # kv-major grid for dw/db: row tiles fastest
    row2 = pl.BlockSpec((bm, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    wv2 = pl.BlockSpec((d, bv), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    bias2 = pl.BlockSpec((1, bv), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    lanes2 = pl.BlockSpec(
        (bm, _LSE_LANES), lambda j, i: (i, 0), memory_space=pltpu.VMEM
    )
    dw, db = pl.pallas_call(
        functools.partial(_flce_dw_kernel, ni=ni, bv=bv, vocab=vocab),
        grid=(nv, ni),
        in_specs=[row2, wv2, bias2, lanes2, lanes2, lanes2],
        out_specs=(wv2, bias2),
        out_shape=(
            jax.ShapeDtypeStruct((d, vp), w.dtype),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, bv), jnp.float32),
            pltpu.VMEM((8, bv), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_p, w_p, b_p, t_p, lse_p, g_p)
    return dx[:n], dw[:, :vocab], db[0, :vocab].astype(b.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "block_vocab"))
def fused_linear_ce(x, w, b, targets, block_rows: int = 128, block_vocab: int = _FLCE_BV):
    """Per-row cross-entropy of the LM head ``x @ w + b`` against int
    ``targets`` — loss_i = logsumexp_v(logits_iv) - logits_i,t_i — with the
    (N, V) logits never materialized in HBM (streamed per vocab tile,
    forward AND backward).  x: (N, D); w: (D, V); b: (V,); targets: (N,)
    int.  Differentiable in x, w, b (targets get no gradient)."""

    @jax.custom_vjp
    def run(x, w, b, tf):
        loss, _ = _flce_fwd_impl(x, w, b, tf.astype(jnp.int32), block_rows, block_vocab)
        return loss

    def fwd(x, w, b, tf):
        t = tf.astype(jnp.int32)
        loss, lse = _flce_fwd_impl(x, w, b, t, block_rows, block_vocab)
        return loss, (x, w, b, t, lse)

    def bwd(res, g):
        x, w, b, t, lse = res
        dx, dw, db = _flce_bwd_impl(x, w, b, t, lse, g, block_rows, block_vocab)
        return dx, dw, db, jnp.zeros(t.shape, jnp.float32)

    run.defvjp(fwd, bwd)
    # targets ride through AD as f32 so the cotangent structure is plain
    # (int primals would need float0 cotangents); values are exact ints
    return run(x, w, b, targets.astype(jnp.float32))


# ----------------------------------------------- w8a8 native-MXU int8 matmul
# The weight-only int8 path loses to bf16 decode on v5e because its
# in-kernel int8->bf16 widening is VPU-bound (BENCH_NOTES "int8 regime
# hunt": one convert per weight byte costs more than the DMA bytes saved).
# The MXU itself runs s8 x s8 -> s32 natively at 2x bf16 peak, so the
# dequant-free path is to quantize the ACTIVATIONS too: per-row dynamic
# symmetric int8 (computed cheaply in XLA — activation bytes are
# negligible next to weights in decode) against the per-output-channel
# weight scale.  Numerics tradeoff: ~1/127 relative quantization noise on
# activations — experimental, decode-only.


def quantize_int8_rows(x):
    """Per-row dynamic symmetric int8 quantization of (M, K) activations.
    Returns (xq int8, sx f32 (M,)) with xq * sx[:, None] ~= x."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1)
    sx = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    xq = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127).astype(jnp.int8)
    return xq, sx


def _w8a8_kernel(xq_ref, wq_ref, sx_ref, sw_ref, out_ref, acc_ref, *, k_steps):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # native s8 x s8 -> s32 MXU matmul: no widening of either operand
    acc_ref[:] += jax.lax.dot(
        xq_ref[:], wq_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(kk == k_steps - 1)
    def _():
        out_ref[:] = (
            acc_ref[:].astype(jnp.float32) * sx_ref[:, 0:1] * sw_ref[:]
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tile_m", "tile_n", "tile_k")
)
def w8a8_matmul(
    xq, sx, wq, sw, out_dtype=jnp.float32,
    tile_m: int = 128, tile_n: int = 256, tile_k: int = 512,
):
    """(xq * sx[row]) @ (wq * sw[col]) with s8 x s8 -> s32 MXU accumulation.

    xq: (M, K) int8; sx: (M,) f32; wq: (K, N) int8; sw: (N,) f32.  The
    int32 accumulator is exact (|sum| <= K * 127^2 < 2^31 for K < 133k),
    so the only quantization error is in the inputs."""
    m, k = xq.shape
    if k * 127 * 127 >= 2**31:
        raise ValueError(
            f"w8a8_matmul: K={k} can overflow the int32 accumulator "
            "(K * 127^2 >= 2^31); split the contraction dimension"
        )
    _, n = wq.shape
    out_dtype = jnp.dtype(out_dtype)
    tile_m = min(tile_m, _round_up(m, 32))
    mp = _round_up(m, tile_m)
    kp = _round_up(k, tile_k)
    np_ = _round_up(n, tile_n)
    xq_p = jnp.pad(xq, ((0, mp - m), (0, kp - k)))
    wq_p = jnp.pad(wq, ((0, kp - k), (0, np_ - n)))
    # row scale enters as an (M, 1)-broadcastable column, lane-padded to 128
    sx_p = jnp.pad(sx.reshape(-1, 1), ((0, mp - m), (0, 127)))
    sw_p = jnp.pad(sw.reshape(1, -1), ((0, 0), (0, np_ - n)))
    k_steps = kp // tile_k
    grid = (mp // tile_m, np_ // tile_n, k_steps)
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, k_steps=k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, tile_k), lambda i, j, kk: (i, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_k, tile_n), lambda i, j, kk: (kk, j),
                memory_space=pltpu.VMEM,
            ),
            # the row-scale block must span the full 128-lane dim (Mosaic:
            # last block dim == array dim or a 128-multiple); the kernel
            # reads column 0
            pl.BlockSpec(
                (tile_m, 128), lambda i, j, kk: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j, kk: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j, kk: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=mp * kp + kp * np_ + out_dtype.itemsize * mp * np_,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq_p, wq_p, sx_p, sw_p)
    return out[:m, :n]


# ------------------------------------------------------------ flash attention
# FlashAttention-2-style online-softmax tiled attention (fwd + recompute
# backward) for (B, H, L, D) inputs.  The naive tape path materializes the
# (B, H, L, L) score/softmax tensors in HBM — the classic HBM-bandwidth
# cliff (BENCH_NOTES r02: LM MFU 56% -> 48% going seq 128 -> 256).  Here
# scores never leave VMEM: the forward streams KV blocks through a running
# (max, sum, accumulator) triple; the backward recomputes P = exp(S - lse)
# per block from the saved log-sum-exp instead of reading a stored softmax.
# Causal blocks strictly above the diagonal skip their compute (the DMA
# still runs — block skipping is predication, not grid reshaping).
# Integration: nn.MultiheadAttention routes through this kernel via the
# jax_function AD bridge (flash=True / auto on real TPU).

_NEG_INF = -1e30
# lane width of the row-scalar (lse/delta) arrays: Mosaic requires the last
# block dim to equal the array dim or be a 128-multiple; 8 lanes keeps the
# arrays 16x smaller than the official MIN_BLOCK_SIZE=128 layout while
# satisfying "equal to the array dimension"
_LSE_LANES = 8


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, nk, bq, bk, causal, lk, window,
):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: whole blocks strictly above the diagonal contribute
    # nothing; with a sliding window, blocks entirely BELOW the band
    # (every kpos <= every qpos - window) skip too
    needed = True if not causal else (j * bk <= i * bq + bq - 1)
    if causal and window:
        needed = jnp.logical_and(
            needed, j * bk + bk - 1 >= i * bq - (window - 1)
        )

    @pl.when(needed)
    def _():
        q = q_ref[0]
        kb = k_ref[0]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = kpos >= lk  # padded KV tail
        if causal:
            qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask = jnp.logical_or(mask, kpos > qpos)
            if window:
                mask = jnp.logical_or(mask, kpos <= qpos - window)
        s = jnp.where(mask, _NEG_INF, s)
        m_prev = m_ref[:, 0:1]  # (bq, 1)
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)  # (bq, bk) f32
        l_cur = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
        )
        m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_cur, l_ref.shape)

    @pl.when(j == nk - 1)
    def _():
        l_fin = l_ref[:, 0:1]
        m_fin = m_ref[:, 0:1]
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)  # padded q rows
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        # row scalar broadcast across the small lane dim (Mosaic requires
        # the last block dim == array dim or a multiple of 128; a (1, bq)
        # block over (BH, L) violates the sublane rule)
        lse_ref[0] = jnp.broadcast_to(
            m_fin + jnp.log(l_safe), lse_ref.shape[1:]
        )


def _flash_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, scale, nk, bq, bk, causal, lk, window,
):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    needed = True if not causal else (j * bk <= i * bq + bq - 1)
    if causal and window:
        needed = jnp.logical_and(
            needed, j * bk + bk - 1 >= i * bq - (window - 1)
        )

    @pl.when(needed)
    def _():
        q = q_ref[0]
        kb = k_ref[0]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = kpos >= lk
        if causal:
            qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask = jnp.logical_or(mask, kpos > qpos)
            if window:
                mask = jnp.logical_or(mask, kpos <= qpos - window)
        s = jnp.where(mask, _NEG_INF, s)
        p = jnp.exp(s - lse_ref[0][:, 0:1])  # (bq, bk); masked -> 0
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = p * (dp - delta_ref[0][:, 0:1]) * scale
        dq_acc[:] += jax.lax.dot(
            ds.astype(k_ref.dtype), kb, preferred_element_type=jnp.float32
        )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, nq, bq, bk, causal, lk, window,
):
    # grid: (BH, nk, nq) — q blocks iterate fastest; one (dk, dv) pair
    # accumulates per KV block
    j, qi = pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    needed = True if not causal else (qi * bq + bq - 1 >= j * bk)
    if causal and window:
        needed = jnp.logical_and(
            needed, qi * bq <= j * bk + bk - 1 + (window - 1)
        )

    @pl.when(needed)
    def _():
        # q-major score layout (bq, bk) as in the dq kernel — dk/dv then
        # contract over the q dim (dim-0 contraction == transposed-lhs
        # matmul, native on the MXU; avoids (bq,1)->(1,bq) relayouts of the
        # lse/delta rows)
        q = q_ref[0]
        kb = k_ref[0]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = kpos >= lk
        if causal:
            qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask = jnp.logical_or(mask, kpos > qpos)
            if window:
                mask = jnp.logical_or(mask, kpos <= qpos - window)
        s = jnp.where(mask, _NEG_INF, s)
        p = jnp.exp(s - lse_ref[0][:, 0:1])  # (bq, bk)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, dp)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = p * (dp - delta_ref[0][:, 0:1]) * scale
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, dp)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_pad(x, lp, dp):
    b, l, d = x.shape
    if l == lp and d == dp:
        return x
    return jnp.pad(x, ((0, 0), (0, lp - l), (0, dp - d)))


def _flash_blocks(lq, lk, block_q, block_k):
    """Auto block sizes: bigger blocks = fewer (sequential) grid steps and
    bigger MXU ops; 512 keeps the f32 score block at 1 MiB of VMEM."""
    bq = min(block_q or 512, _round_up(lq, 8))
    bk = min(block_k or 512, _round_up(lk, 8))
    return bq, bk


# ---------------------- single-block (short-L) head-packed flash fast path
# When the whole sequence fits one block (nq == nk == 1, i.e. L <= 512 at
# default block sizes) the online-softmax machinery is pure overhead: no
# running (max, sum) rescale is needed, and the backward's two kernels each
# recomputing the scores collapse into ONE kernel with ONE recompute that
# emits dq/dk/dv together.  Packing g heads per grid step amortizes the
# per-step DMA/grid overhead that dominates at short L (a (128, 64) bf16
# q block is a 16 KB DMA — latency-bound; g=8 makes it 128 KB) — this is
# the r3-measured regime where the multi-block kernel lost to XLA's batched
# matmuls (0.58x at L=128, BENCH_NOTES "Flash attention").


def _flash_packed_mask(lqp, lkp, lk, causal, window):
    """(lqp, lkp) bool mask, True = masked out; shared across the g heads."""
    kpos = jax.lax.broadcasted_iota(jnp.int32, (lqp, lkp), 1)
    mask = kpos >= lk  # padded KV tail
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (lqp, lkp), 0)
        mask = jnp.logical_or(mask, kpos > qpos)
        if window:
            mask = jnp.logical_or(mask, kpos <= qpos - window)
    return mask


def _flash_packed_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, g, causal, lk, window,
):
    lqp, lkp = q_ref.shape[1], k_ref.shape[1]
    mask = _flash_packed_mask(lqp, lkp, lk, causal, window)
    for h in range(g):  # static unroll: one MXU chain per packed head
        q = q_ref[h]
        s = jax.lax.dot_general(
            q, k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask, _NEG_INF, s)
        m = jnp.max(s, axis=1, keepdims=True)  # one-pass: no running rescale
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[h] = (
            jax.lax.dot(
                p.astype(v_ref.dtype), v_ref[h],
                preferred_element_type=jnp.float32,
            ) / l_safe
        ).astype(o_ref.dtype)
        lse_ref[h] = jnp.broadcast_to(
            m + jnp.log(l_safe), lse_ref.shape[1:]
        )


def _flash_packed_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, *, scale, g, causal, lk, window,
):
    lqp, lkp = q_ref.shape[1], k_ref.shape[1]
    mask = _flash_packed_mask(lqp, lkp, lk, causal, window)
    for h in range(g):
        q = q_ref[h]
        kb = k_ref[h]
        do = do_ref[h]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask, _NEG_INF, s)
        p = jnp.exp(s - lse_ref[h][:, 0:1])  # masked -> 0
        dv_ref[h] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[h][:, 0:1]) * scale
        dq_ref[h] = jax.lax.dot(
            ds.astype(kb.dtype), kb, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[h] = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _flash_pack_g(bh, lqp, lkp, rows_budget):
    """Heads per grid step: fill ~rows_budget of q rows per step, bounded
    by the f32 (lqp, lkp) score temporaries the unrolled loop keeps live."""
    g = max(1, rows_budget // max(lqp, 1))
    while g > 1 and (bh % g or g * lqp * lkp * 4 > 4 * 1024 * 1024):
        g -= 1
    return g


def _flash_fwd_impl(q, k, v, causal, scale, block_q, block_k, window):
    """q,k,v: (BH, L, D) -> (out (BH, L, D), lse (BH, Lqp) f32)."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    bq, bk = _flash_blocks(lq, lk, block_q, block_k)
    lqp, lkp, dp = _round_up(lq, bq), _round_up(lk, bk), _round_up(d, 8)
    # D is NOT padded to 128: the block covers the full (8-aligned) head dim,
    # which Mosaic allows ("equal to the array dimension") — padding 64->128
    # doubled every q/k/v/o DMA for the common head_dim=64 (measured 2x
    # throughput loss at seq 128)
    qp = _flash_pad(q, lqp, dp)
    kp = _flash_pad(k, lkp, dp)
    vp = _flash_pad(v, lkp, dp)
    nq, nk = lqp // bq, lkp // bk
    if nq == 1 and nk == 1:
        # short-L fast path: one-pass softmax, g heads per grid step
        g = _flash_pack_g(bh, lqp, lkp, rows_budget=2048)
        blk = pl.BlockSpec((g, lqp, dp), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        blk_kvp = pl.BlockSpec((g, lkp, dp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        blk_lsep = pl.BlockSpec((g, lqp, _LSE_LANES), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_packed_fwd_kernel, scale=scale, g=g,
                causal=causal, lk=lk, window=window,
            ),
            grid=(bh // g,),
            in_specs=[blk, blk_kvp, blk_kvp],
            out_specs=(blk, blk_lsep),
            out_shape=(
                jax.ShapeDtypeStruct((bh, lqp, dp), q.dtype),
                jax.ShapeDtypeStruct((bh, lqp, _LSE_LANES), jnp.float32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * lqp * lkp * dp,
                bytes_accessed=2 * bh * (lqp + 2 * lkp) * dp * q.dtype.itemsize,
                transcendentals=bh * lqp * lkp,
            ),
            interpret=_interpret(),
        )(qp, kp, vp)
        return out[:, :lq, :d], lse[:, :, 0]
    blk_q = pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    blk_lse = pl.BlockSpec(
        (1, bq, _LSE_LANES), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, scale=scale, nk=nk, bq=bq, bk=bk,
            causal=causal, lk=lk, window=window,
        ),
        grid=(bh, nq, nk),
        in_specs=[blk_q, blk_kv, blk_kv],
        out_specs=(blk_q, blk_lse),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lqp, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, lqp, _LSE_LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, dp), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lqp * lkp * dp,
            bytes_accessed=2 * bh * (lqp + 2 * lkp) * dp * q.dtype.itemsize,
            transcendentals=bh * lqp * lkp,
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out[:, :lq, :d], lse[:, :, 0]


def _flash_bwd_impl(q, k, v, out, lse, do, causal, scale, block_q,
                    block_k, window):
    bh, lq, d = q.shape
    lk = k.shape[1]
    bq, bk = _flash_blocks(lq, lk, block_q, block_k)
    lqp, lkp, dp = _round_up(lq, bq), _round_up(lk, bk), _round_up(d, 8)
    # D is NOT padded to 128: the block covers the full (8-aligned) head dim,
    # which Mosaic allows ("equal to the array dimension") — padding 64->128
    # doubled every q/k/v/o DMA for the common head_dim=64 (measured 2x
    # throughput loss at seq 128)
    qp = _flash_pad(q, lqp, dp)
    kp = _flash_pad(k, lkp, dp)
    vp = _flash_pad(v, lkp, dp)
    dop = _flash_pad(do, lqp, dp)
    if lse.shape[1] != lqp:
        lse = jnp.pad(lse, ((0, 0), (0, lqp - lse.shape[1])))
    # delta_i = rowsum(dO_i * O_i) — cheap elementwise, stays in XLA
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (bh, lq)
    delta = jnp.pad(delta, ((0, 0), (0, lqp - lq)))
    # lane-broadcast rows into the kernels' (1, bq, _LSE_LANES) blocks
    lse = jnp.broadcast_to(lse[:, :, None], (bh, lqp, _LSE_LANES))
    delta = jnp.broadcast_to(delta[:, :, None], (bh, lqp, _LSE_LANES))
    nq, nk = lqp // bq, lkp // bk

    if nq == 1 and nk == 1:
        # short-L fast path: ONE kernel, ONE score recompute, emits
        # dq/dk/dv together (the multi-block path recomputes scores in both
        # the dq and dkv kernels); g heads per step amortize DMA/grid cost.
        # Tighter rows budget than forward: the unrolled loop keeps the
        # f32 (lqp, lkp) s/p/dp temporaries live per head.
        g = _flash_pack_g(bh, lqp, lkp, rows_budget=1024)
        blk = pl.BlockSpec((g, lqp, dp), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        blk_kvp = pl.BlockSpec((g, lkp, dp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        blk_lsep = pl.BlockSpec((g, lqp, _LSE_LANES), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _flash_packed_bwd_kernel, scale=scale, g=g,
                causal=causal, lk=lk, window=window,
            ),
            grid=(bh // g,),
            in_specs=[blk, blk_kvp, blk_kvp, blk, blk_lsep, blk_lsep],
            out_specs=(blk, blk_kvp, blk_kvp),
            out_shape=(
                jax.ShapeDtypeStruct((bh, lqp, dp), q.dtype),
                jax.ShapeDtypeStruct((bh, lkp, dp), k.dtype),
                jax.ShapeDtypeStruct((bh, lkp, dp), v.dtype),
            ),
            cost_estimate=pl.CostEstimate(
                flops=10 * bh * lqp * lkp * dp,
                bytes_accessed=4 * bh * (2 * lqp + 2 * lkp) * dp
                * q.dtype.itemsize,
                transcendentals=bh * lqp * lkp,
            ),
            interpret=_interpret(),
        )(qp, kp, vp, dop, lse, delta)
        return dq[:, :lq, :d], dk[:, :lk, :d], dv[:, :lk, :d]

    blk_q = pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    row_q = pl.BlockSpec(
        (1, bq, _LSE_LANES), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel, scale=scale, nk=nk, bq=bq, bk=bk,
            causal=causal, lk=lk, window=window,
        ),
        grid=(bh, nq, nk),
        in_specs=[blk_q, blk_kv, blk_kv, blk_q, row_q, row_q],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((bh, lqp, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32)],
        interpret=_interpret(),
    )(qp, kp, vp, dop, lse, delta)

    # kv-major grid: q blocks iterate fastest
    blk_q2 = pl.BlockSpec((1, bq, dp), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    blk_kv2 = pl.BlockSpec((1, bk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)
    row_q2 = pl.BlockSpec(
        (1, bq, _LSE_LANES), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel, scale=scale, nq=nq, bq=bq, bk=bk,
            causal=causal, lk=lk, window=window,
        ),
        grid=(bh, nk, nq),
        in_specs=[blk_q2, blk_kv2, blk_kv2, blk_q2, row_q2, row_q2],
        out_specs=(blk_kv2, blk_kv2),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lkp, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, lkp, dp), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, dp), jnp.float32),
            pltpu.VMEM((bk, dp), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, dop, lse, delta)
    return (
        dq[:, :lq, :d],
        dk[:, :lk, :d],
        dv[:, :lk, :d],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(
    q, k, v, causal=False, sm_scale=None, block_q=None, block_k=None,
    window=None,
):
    """Tiled online-softmax attention: softmax(QK^T * scale [+ causal]) @ V.

    q: (B, H, Lq, D); k/v: (B, H, Lk, D).  Scores never materialize in HBM;
    backward recomputes them per block from the saved log-sum-exp.  Pads
    L to block multiples and D to the 128-lane tile (masked, sliced back).
    """
    out, _ = _flash_attention_fwd(
        q, k, v, causal, sm_scale, block_q, block_k, window
    )
    return out


def _flash_attention_fwd(q, k, v, causal, sm_scale, block_q, block_k,
                         window):
    b, h, lq, d = q.shape
    scale = (1.0 / (d ** 0.5)) if sm_scale is None else sm_scale
    q3 = q.reshape(b * h, lq, d)
    k3 = k.reshape(b * h, k.shape[2], d)
    v3 = v.reshape(b * h, v.shape[2], d)
    out, lse = _flash_fwd_impl(q3, k3, v3, causal, scale, block_q,
                               block_k, window)
    return out.reshape(b, h, lq, d), (q, k, v, out.reshape(b, h, lq, d), lse)


def _flash_attention_bwd(causal, sm_scale, block_q, block_k, window,
                         res, g):
    q, k, v, out, lse = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = (1.0 / (d ** 0.5)) if sm_scale is None else sm_scale
    dq, dk, dv = _flash_bwd_impl(
        q.reshape(b * h, lq, d),
        k.reshape(b * h, lk, d),
        v.reshape(b * h, lk, d),
        out.reshape(b * h, lq, d),
        lse,
        g.reshape(b * h, lq, d),
        causal,
        scale,
        block_q,
        block_k,
        window,
    )
    return (
        dq.reshape(b, h, lq, d),
        dk.reshape(b, h, lk, d),
        dv.reshape(b, h, lk, d),
    )


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)
