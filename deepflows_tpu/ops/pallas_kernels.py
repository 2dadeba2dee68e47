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
