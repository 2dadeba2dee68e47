"""TPU kernel module (JAX / XLA / Pallas).

This is the TPU-native replacement for the reference's compiled CUDA pybind11
extension (`DeepFlows/backend/backend_src/ndarray_backend_cuda.cu`): the same
device-kernel protocol as ``numpy_kernels``, implemented on jnp/lax so every
op is an XLA program (compiled once per shape, cached), with selected hot ops
routed through hand-written Pallas kernels (``deepflows_tpu.ops.pallas_kernels``)
when ``config.use_pallas`` is on.

Design notes (TPU-first, per SURVEY.md §7.1):

- convs/pools use ``lax.conv_general_dilated`` / ``lax.reduce_window`` — XLA
  lowers these straight onto the MXU with fused padding, instead of the
  reference's im2col slice-loop (`DeepFlows/nn/functional.py:263-283`).
- gradients are obtained from ``jax.vjp`` of the forward formula inside a
  jitted wrapper: under whole-step jit, XLA CSE/DCE reduces this to exactly
  the conv-transpose ops; eagerly, the jit cache makes it one compiled call.
- all protocol functions accept/return jax.Arrays (or tracers under an outer
  ``jax.jit`` trace — the whole protocol is traceable, which is what lets
  ``deepflows_tpu.jit.CompiledTrainStep`` compile an entire tape-autograd
  training step into a single XLA program).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import config

xp = jnp
name = "tpu"
is_jax = True

_NCHW = ("NCHW", "OIHW", "NCHW")

# persistent XLA compilation cache (OPT-IN via DEEPFLOWS_COMPILE_CACHE=<dir>):
# first compile of a conv net through this environment's TPU tunnel takes
# minutes and the cache survives restarts — but the tunnel's remote-compile
# can emit CPU AOT artifacts built for the REMOTE machine's CPU features;
# reloading those locally logs feature-mismatch errors and can SIGILL, so
# this is not safe to enable unconditionally.
import os as _os

_cache_dir = _os.environ.get("DEEPFLOWS_COMPILE_CACHE", "")
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def available() -> bool:
    try:
        return len(jax.devices()) > 0
    except Exception:
        return False


# ---------------------------------------------------------------- transfers
def from_numpy(a):
    return jnp.asarray(a)


def to_numpy(a):
    return np.asarray(jax.device_get(a))


def device_put(a):
    return jnp.asarray(a)


def adopt(a, dtype=None):
    """Adopt a raw device array without conversion (BackendTensor fast path;
    the lazy module's override wraps it as a concrete LazyArray instead)."""
    return a if dtype is None else a.astype(dtype)


# ---------------------------------------------------------------- basics
def fill(shape, value, dtype=None):
    return jnp.full(shape, value, dtype=dtype or config.default_dtype)


def setitem(arr, idx, value):
    return arr.at[idx].set(value)


def astype(arr, dtype):
    return arr.astype(dtype)


def scatter_add(shape, idx, values, dtype=None):
    """zeros(shape) with ``values`` scatter-added at ``idx`` (slice gradient).
    XLA lowers this to a fused scatter — the TPU replacement for the
    reference's setitem-into-zeros slice gradient (`tensor.py:971-974`)."""
    return jnp.zeros(shape, dtype=dtype or values.dtype).at[idx].add(values)


def matmul(a, b):
    if (
        config.use_pallas
        and a.ndim == 2
        and b.ndim == 2
        and not isinstance(a, jax.core.Tracer)
    ):
        from ..ops import pallas_kernels as pk

        if pk.matmul_supported(a, b):
            return pk.matmul(a, b)
    return jnp.matmul(a, b)


def reduce_sum(a, axis=None, keepdims=False):
    return jnp.sum(a, axis=axis, keepdims=keepdims)


def reduce_max(a, axis=None, keepdims=False):
    return jnp.max(a, axis=axis, keepdims=keepdims)


# ---------------------------------------------------------------- RNG
_host_key = jax.random.key(config.seed)


def manual_seed(seed: int) -> None:
    global _host_key
    _host_key = jax.random.key(seed)


def _next_host_key():
    global _host_key
    _host_key, sub = jax.random.split(_host_key)
    return sub


def randn(shape, dtype=None, seed=None):
    key = jax.random.key(seed) if seed is not None else _next_host_key()
    return jax.random.normal(key, shape, dtype=dtype or config.default_dtype)


def rand(shape, dtype=None, seed=None):
    key = jax.random.key(seed) if seed is not None else _next_host_key()
    return jax.random.uniform(key, shape, dtype=dtype or config.default_dtype)


def uniform(low, high, shape, dtype=None, seed=None):
    key = jax.random.key(seed) if seed is not None else _next_host_key()
    return jax.random.uniform(
        key, shape, dtype=dtype or config.default_dtype, minval=low, maxval=high
    )


def randint(low, high, shape, seed=None):
    key = jax.random.key(seed) if seed is not None else _next_host_key()
    return jax.random.randint(key, shape, low, high)


def dropout_mask(shape, keep_prob, dtype=None, key=None):
    """On-device inverted-dropout mask — replaces the reference's host-numpy
    mask upload (`DeepFlows/nn/modules/dropout.py:16-28`). ``key`` may be a
    tracer (inside a compiled train step)."""
    dtype = dtype or config.default_dtype
    if key is None:
        key = _next_host_key()
    keep = jax.random.bernoulli(key, keep_prob, shape)
    return keep.astype(dtype) / jnp.asarray(keep_prob, dtype=dtype)


def one_hot(indices, num_classes, dtype=None):
    return jax.nn.one_hot(
        jnp.asarray(indices), num_classes, dtype=dtype or config.default_dtype
    )


# ---------------------------------------------------------------- conv
def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


@partial(jax.jit, static_argnames=("stride", "padding", "groups"))
def _conv2d(x, w, stride, padding, groups):
    sh, sw = stride
    ph, pw = padding
    # output dtype == input dtype; the TPU MXU accumulates bf16 products in
    # f32 internally, so this is safe for mixed precision AND keeps the conv
    # VJP transposable (an astype-on-output breaks the same-dtype requirement
    # of the transposed conv)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_NCHW,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


def conv2d(x, w, stride=1, padding=0, groups=1):
    """x: (N,Cin,H,W), w: (Cout,Cin/groups,kh,kw) -> (N,Cout,oh,ow)."""
    return _conv2d(x, w, _pair(stride), _pair(padding), groups)


@partial(jax.jit, static_argnames=("stride", "padding", "groups"))
def _conv2d_grad(x, w, gy, stride, padding, groups):
    _, vjp = jax.vjp(lambda xx, ww: _conv2d(xx, ww, stride, padding, groups), x, w)
    return vjp(gy)


def conv2d_grad(x, w, gy, stride=1, padding=0, groups=1):
    return _conv2d_grad(x, w, gy, _pair(stride), _pair(padding), groups)


def conv1d(x, w, stride=1, padding=0, groups=1):
    y = conv2d(x[..., None], w[..., None], (stride, 1), (padding, 0), groups)
    return y[..., 0]


def conv1d_grad(x, w, gy, stride=1, padding=0, groups=1):
    gx, gw = conv2d_grad(
        x[..., None], w[..., None], gy[..., None], (stride, 1), (padding, 0), groups
    )
    return gx[..., 0], gw[..., 0]


# ---------------------------------------------------------------- batchnorm
@partial(jax.jit, static_argnames=("axes", "eps"))
def _bn_train(x, gamma, beta, axes, eps):
    n = 1
    for ax in axes:
        n *= x.shape[ax]
    mean = jnp.sum(x, axes, keepdims=True) / n
    diff = x - mean
    var = jnp.sum(diff * diff, axes, keepdims=True) / n  # biased, like reference
    out = diff / jnp.sqrt(var + eps)
    if gamma is not None:
        out = out * gamma + beta
    # f32 affine params must not upcast bf16 activations (protocol parity
    # with the numpy kernel's out.astype(x.dtype))
    return out.astype(x.dtype), mean, var


def batchnorm_train(x, gamma, beta, axes, eps):
    """Fused train-mode batch norm: (out, batch_mean, batch_var) in ONE
    compiled program — replaces the ~10 tape nodes the composed formula costs
    (reference composes it from single-axis sums, `nn/modules/batchnorm.py:31-47`)."""
    return _bn_train(x, gamma, beta, tuple(axes), float(eps))


@partial(jax.jit, static_argnames=("axes", "eps"))
def _bn_grad(x, gamma, gy, axes, eps):
    def fwd(xx, gg):
        return _bn_train(xx, gg, jnp.zeros_like(gg) if gg is not None else None,
                         axes, eps)[0]

    if gamma is None:
        out, vjp = jax.vjp(lambda xx: fwd(xx, None), x)
        (gx,) = vjp(gy)
        return gx, None, None
    out, vjp = jax.vjp(fwd, x, gamma)
    gx, ggamma = vjp(gy)
    gbeta = jnp.sum(gy, axes, keepdims=True)
    return gx, ggamma, gbeta


def batchnorm_grad(x, gamma, gy, axes, eps):
    """(gx, dgamma, dbeta) for train-mode BN, one compiled program."""
    return _bn_grad(x, gamma, gy, tuple(axes), float(eps))


@partial(jax.jit, static_argnames=("eps",))
def _bn_eval(x, gamma, beta, rm, rv, eps):
    out = (x - rm) / jnp.sqrt(rv + eps)
    if gamma is not None:
        out = out * gamma + beta
    # f32 running stats must not upcast a bf16 inference graph (protocol:
    # the numpy kernel casts back to x.dtype too)
    return out.astype(x.dtype)


def batchnorm_eval(x, gamma, beta, rm, rv, eps):
    """Eval-mode BN against running stats, one compiled program.  NOTE: the
    reference normalizes eval with ``/(rv+eps)**0.5`` too
    (`batchnorm.py:48-52`)."""
    return _bn_eval(x, gamma, beta, rm, rv, float(eps))


# ---------------------------------------------------------------- losses
@partial(jax.jit, static_argnames=("reduction",))
def _softmax_xent(logits, target, reduction):
    m = jnp.max(logits, 1, keepdims=True)
    shifted = logits - m
    logz = jnp.log(jnp.sum(jnp.exp(shifted), 1, keepdims=True))
    nll = -(shifted - logz) * target
    total = jnp.sum(nll)
    if reduction == "mean":
        total = total / logits.shape[0]
    return total


def softmax_xent(logits, target, reduction="mean"):
    """Fused stable cross-entropy vs a (one-hot) target matrix in ONE
    compiled program (reference composes it from ~10 ops,
    `DeepFlows/nn/functional.py:104-115`)."""
    return _softmax_xent(logits, target, reduction)


@partial(jax.jit, static_argnames=("reduction",))
def _softmax_xent_grad(logits, target, gy, reduction):
    m = jnp.max(logits, 1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, 1, keepdims=True)
    t_mass = jnp.sum(target, 1, keepdims=True)
    g = (p * t_mass - target) * gy
    if reduction == "mean":
        g = g / logits.shape[0]
    return g.astype(logits.dtype)


def softmax_xent_grad(logits, target, gy, reduction="mean"):
    """d(loss)/d(logits) for ``softmax_xent`` (closed form, one program)."""
    return _softmax_xent_grad(logits, target, gy, reduction)


# ---------------------------------------------------------------- pooling
@partial(jax.jit, static_argnames=("ksize", "stride", "padding"))
def _max_pool2d(x, ksize, stride, padding):
    kh, kw = ksize
    sh, sw = stride
    ph, pw = padding
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding=((0, 0), (0, 0), (ph, ph), (pw, pw)),
    )


def max_pool2d(x, kernel_size, stride=None, padding=0):
    k = _pair(kernel_size)
    return _max_pool2d(x, k, _pair(stride) if stride else k, _pair(padding))


@partial(jax.jit, static_argnames=("ksize", "stride", "padding"))
def _max_pool2d_grad(x, gy, ksize, stride, padding):
    _, vjp = jax.vjp(lambda xx: _max_pool2d(xx, ksize, stride, padding), x)
    return vjp(gy)[0]


def max_pool2d_grad(x, gy, kernel_size, stride=None, padding=0):
    k = _pair(kernel_size)
    return _max_pool2d_grad(x, gy, k, _pair(stride) if stride else k, _pair(padding))


@partial(jax.jit, static_argnames=("ksize", "stride", "padding"))
def _avg_pool2d(x, ksize, stride, padding):
    # constant depthwise conv: MXU-friendly, and reverse-differentiable
    # (reduce_window-sum lacks a VJP in this JAX version); divides by the
    # full window incl. zero padding (torch count_include_pad=True).
    kh, kw = ksize
    c = x.shape[1]
    kernel = jnp.full((c, 1, kh, kw), 1.0 / (kh * kw), x.dtype)
    return _conv2d(x, kernel, stride, padding, groups=c)


def avg_pool2d(x, kernel_size, stride=None, padding=0):
    k = _pair(kernel_size)
    return _avg_pool2d(x, k, _pair(stride) if stride else k, _pair(padding))


@partial(jax.jit, static_argnames=("ksize", "stride", "padding"))
def _avg_pool2d_grad(x, gy, ksize, stride, padding):
    _, vjp = jax.vjp(lambda xx: _avg_pool2d(xx, ksize, stride, padding), x)
    return vjp(gy)[0]


def avg_pool2d_grad(x, gy, kernel_size, stride=None, padding=0):
    k = _pair(kernel_size)
    return _avg_pool2d_grad(x, gy, k, _pair(stride) if stride else k, _pair(padding))


def max_pool1d(x, kernel_size, stride=None, padding=0):
    return max_pool2d(
        x[..., None], (kernel_size, 1), (stride or kernel_size, 1), (padding, 0)
    )[..., 0]


def max_pool1d_grad(x, gy, kernel_size, stride=None, padding=0):
    return max_pool2d_grad(
        x[..., None],
        gy[..., None],
        (kernel_size, 1),
        (stride or kernel_size, 1),
        (padding, 0),
    )[..., 0]


def avg_pool1d(x, kernel_size, stride=None, padding=0):
    return avg_pool2d(
        x[..., None], (kernel_size, 1), (stride or kernel_size, 1), (padding, 0)
    )[..., 0]


def avg_pool1d_grad(x, gy, kernel_size, stride=None, padding=0):
    return avg_pool2d_grad(
        x[..., None],
        gy[..., None],
        (kernel_size, 1),
        (stride or kernel_size, 1),
        (padding, 0),
    )[..., 0]
