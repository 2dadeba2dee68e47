"""CPU kernel module (NumPy) — the in-process test double.

Plays the role of the reference's ``NumpyBackend`` device-protocol clone
(`DeepFlows/backend/backend_tensor.py:64-172`): a pure-NumPy implementation of
the same kernel protocol the accelerator device implements, so the whole
framework runs without a TPU.

Unlike the reference — whose protocol is flat-buffer + explicit strides
because CUDA pointers alias mutable memory — this rebuild's protocol is
array-in/array-out on shaped arrays: views (reshape/permute/broadcast) are
device ops that XLA treats as metadata, so there is nothing to gain from
hand-managed strides, and the NumPy side mirrors that contract exactly.

Protocol (shared with ``jax_kernels``):
    xp                                   numpy-like namespace
    from_numpy / to_numpy / device_put
    fill(shape, value, dtype)
    setitem(arr, idx, value) -> arr      functional update
    matmul(a, b)                         2-D / batched
    reduce_sum / reduce_max(a, axis, keepdims)
    randn / rand / uniform / randint     RNG draws
    dropout_mask(shape, keep_prob)
    one_hot(indices, num_classes, dtype)
    conv2d / conv2d_grad, conv1d / conv1d_grad     (with groups)
    max_pool2d / max_pool2d_grad, avg_pool2d / avg_pool2d_grad (+ 1-D)
"""

from __future__ import annotations

import numpy as np

from ..config import config

xp = np
name = "cpu"
is_jax = False

_rng = np.random.default_rng(config.seed)


def manual_seed(seed: int) -> None:
    global _rng
    _rng = np.random.default_rng(seed)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------- transfers
def from_numpy(a):
    return np.ascontiguousarray(a)


def to_numpy(a):
    return np.asarray(a)


def device_put(a):
    return np.asarray(a)


# ---------------------------------------------------------------- basics
def fill(shape, value, dtype=None):
    return np.full(shape, value, dtype=dtype or config.default_dtype)


def setitem(arr, idx, value):
    out = np.array(arr)  # copy: protocol is functional (XLA buffers are immutable)
    out[idx] = value
    return out


def astype(arr, dtype):
    return arr.astype(dtype)


def scatter_add(shape, idx, values, dtype=None):
    """zeros(shape) with ``values`` scatter-added at ``idx`` (slice gradient)."""
    out = np.zeros(shape, dtype=dtype or values.dtype)
    np.add.at(out, idx, values)
    return out


def matmul(a, b):
    return np.matmul(a, b)


def reduce_sum(a, axis=None, keepdims=False):
    return np.sum(a, axis=axis, keepdims=keepdims)


def reduce_max(a, axis=None, keepdims=False):
    return np.max(a, axis=axis, keepdims=keepdims)


# ---------------------------------------------------------------- RNG
def randn(shape, dtype=None, seed=None):
    r = np.random.default_rng(seed) if seed is not None else _rng
    return r.standard_normal(shape).astype(dtype or config.default_dtype)


def rand(shape, dtype=None, seed=None):
    r = np.random.default_rng(seed) if seed is not None else _rng
    return r.random(shape).astype(dtype or config.default_dtype)


def uniform(low, high, shape, dtype=None, seed=None):
    r = np.random.default_rng(seed) if seed is not None else _rng
    return r.uniform(low, high, shape).astype(dtype or config.default_dtype)


def randint(low, high, shape, seed=None):
    r = np.random.default_rng(seed) if seed is not None else _rng
    return r.integers(low, high, shape)


def dropout_mask(shape, keep_prob, dtype=None):
    """Inverted-dropout mask: Bernoulli(keep_prob)/keep_prob.

    The reference generates the mask host-side with np.random.binomial and
    uploads it (`DeepFlows/nn/modules/dropout.py:16-28`); on the CPU device
    the host *is* the device.
    """
    dtype = dtype or config.default_dtype
    mask = (_rng.random(shape) < keep_prob).astype(dtype)
    return mask / np.asarray(keep_prob, dtype=dtype)


def one_hot(indices, num_classes, dtype=None):
    dtype = dtype or config.default_dtype
    return np.eye(num_classes, dtype=dtype)[np.asarray(indices, dtype=np.int64)]


# ---------------------------------------------------------------- conv
def _pad_nchw(x, ph, pw, value=0.0):
    if ph == 0 and pw == 0:
        return x
    return np.pad(
        x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), constant_values=value
    )


def _im2col_view(x, kh, kw, sh, sw):
    """(N,C,H,W) -> read-only strided view (N,C,kh,kw,oh,ow)."""
    n, c, h, w = x.shape
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    s0, s1, s2, s3 = x.strides
    return np.lib.stride_tricks.as_strided(
        x, (n, c, kh, kw, oh, ow), (s0, s1, s2, s3, s2 * sh, s3 * sw), writeable=False
    )


def conv2d(x, w, stride=1, padding=0, groups=1):
    """x: (N,Cin,H,W), w: (Cout,Cin/groups,kh,kw) -> (N,Cout,oh,ow).

    im2col + tensordot, mirroring the reference's im2col formulation
    (`DeepFlows/nn/functional.py:316-344`) but with stride-tricks (zero copy)
    and groups support (the reference has none, `DeepFlows/nn/modules/conv.py`).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    xpad = _pad_nchw(x, ph, pw)
    co, cig, kh, kw = w.shape
    cols = _im2col_view(xpad, kh, kw, sh, sw)  # (N,Cin,kh,kw,oh,ow)
    if groups == 1:
        y = np.tensordot(cols, w, axes=([1, 2, 3], [1, 2, 3]))  # (N,oh,ow,Cout)
        return np.ascontiguousarray(y.transpose(0, 3, 1, 2))
    n = x.shape[0]
    oh, ow = cols.shape[4], cols.shape[5]
    cols_g = cols.reshape(n, groups, cig, kh, kw, oh, ow)
    w_g = w.reshape(groups, co // groups, cig, kh, kw)
    y = np.einsum("ngckluv,gdckl->ngduv", cols_g, w_g)
    return np.ascontiguousarray(y.reshape(n, co, oh, ow))


def conv2d_grad(x, w, gy, stride=1, padding=0, groups=1):
    """Gradients of conv2d wrt (x, w) with correct scatter-add over
    overlapping windows — the reference's 2-D col2im overwrote instead of
    accumulating (`DeepFlows/nn/functional.py:285-294`); fixed per SURVEY §7.1.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    xpad = _pad_nchw(x, ph, pw)
    co, cig, kh, kw = w.shape
    n, ci, hp, wp = xpad.shape
    oh, ow = gy.shape[2], gy.shape[3]

    cols = _im2col_view(xpad, kh, kw, sh, sw)
    if groups == 1:
        gw = np.tensordot(gy, cols, axes=([0, 2, 3], [0, 4, 5]))  # (Cout,Cin,kh,kw)
        gcols = np.einsum("nouv,ockl->nckluv", gy, w)
    else:
        cols_g = cols.reshape(n, groups, cig, kh, kw, oh, ow)
        gy_g = gy.reshape(n, groups, co // groups, oh, ow)
        gw = np.einsum("ngduv,ngckluv->gdckl", gy_g, cols_g).reshape(co, cig, kh, kw)
        w_g = w.reshape(groups, co // groups, cig, kh, kw)
        gcols = np.einsum("ngduv,gdckl->ngckluv", gy_g, w_g).reshape(
            n, ci, kh, kw, oh, ow
        )
    gx_pad = np.zeros_like(xpad)
    for i in range(kh):
        for j in range(kw):
            gx_pad[:, :, i : i + sh * oh : sh, j : j + sw * ow : sw] += gcols[
                :, :, i, j
            ]
    gx = gx_pad[:, :, ph : hp - ph, pw : wp - pw] if (ph or pw) else gx_pad
    return np.ascontiguousarray(gx), gw.astype(w.dtype)


def conv1d(x, w, stride=1, padding=0, groups=1):
    """x: (N,C,L), w: (Cout,Cin/groups,k) — lowered to conv2d with W=1."""
    y = conv2d(x[..., None], w[..., None], (stride, 1), (padding, 0), groups)
    return y[..., 0]


def conv1d_grad(x, w, gy, stride=1, padding=0, groups=1):
    gx, gw = conv2d_grad(
        x[..., None], w[..., None], gy[..., None], (stride, 1), (padding, 0), groups
    )
    return gx[..., 0], gw[..., 0]


# ---------------------------------------------------------------- pooling
def max_pool2d(x, kernel_size, stride=None, padding=0):
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride) if stride else (kh, kw)
    ph, pw = _pair(padding)
    xpad = _pad_nchw(x, ph, pw, value=-np.inf)
    cols = _im2col_view(xpad, kh, kw, sh, sw)
    return np.ascontiguousarray(cols.max(axis=(2, 3)))


def max_pool2d_grad(x, gy, kernel_size, stride=None, padding=0):
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride) if stride else (kh, kw)
    ph, pw = _pair(padding)
    xpad = _pad_nchw(x, ph, pw, value=-np.inf)
    n, c, hp, wp = xpad.shape
    cols = _im2col_view(xpad, kh, kw, sh, sw)
    oh, ow = cols.shape[4], cols.shape[5]
    out = cols.max(axis=(2, 3))
    gx_pad = np.zeros((n, c, hp, wp), dtype=x.dtype)
    taken = np.zeros((n, c, oh, ow), dtype=bool)  # first-max-wins, like torch
    for i in range(kh):
        for j in range(kw):
            hit = (cols[:, :, i, j] == out) & ~taken
            taken |= hit
            gx_pad[:, :, i : i + sh * oh : sh, j : j + sw * ow : sw] += np.where(
                hit, gy, 0
            ).astype(x.dtype)
    if ph or pw:
        gx_pad = gx_pad[:, :, ph : hp - ph, pw : wp - pw]
    return gx_pad


def avg_pool2d(x, kernel_size, stride=None, padding=0):
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride) if stride else (kh, kw)
    ph, pw = _pair(padding)
    xpad = _pad_nchw(x, ph, pw)
    cols = _im2col_view(xpad, kh, kw, sh, sw)
    return np.ascontiguousarray(cols.mean(axis=(2, 3), dtype=x.dtype))


def avg_pool2d_grad(x, gy, kernel_size, stride=None, padding=0):
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride) if stride else (kh, kw)
    ph, pw = _pair(padding)
    n, c, h, w = x.shape
    hp, wp = h + 2 * ph, w + 2 * pw
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1
    g = (gy / (kh * kw)).astype(x.dtype)
    gx_pad = np.zeros((n, c, hp, wp), dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            gx_pad[:, :, i : i + sh * oh : sh, j : j + sw * ow : sw] += g
    if ph or pw:
        gx_pad = gx_pad[:, :, ph : hp - ph, pw : wp - pw]
    return gx_pad


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


# ---------------------------------------------------------------- batchnorm
def batchnorm_train(x, gamma, beta, axes, eps):
    """Fused train-mode batch norm (out, batch_mean, batch_var); biased
    variance like the reference (`nn/modules/batchnorm.py:31-42`)."""
    axes = tuple(axes)
    mean = x.mean(axes, keepdims=True, dtype=x.dtype)
    diff = x - mean
    var = (diff * diff).mean(axes, keepdims=True, dtype=x.dtype)
    out = diff / np.sqrt(var + eps)
    if gamma is not None:
        out = out * gamma + beta
    return out.astype(x.dtype), mean, var


def batchnorm_grad(x, gamma, gy, axes, eps):
    """(gx, dgamma, dbeta) — closed-form biased-variance BN backward."""
    axes = tuple(axes)
    n = 1
    for ax in axes:
        n *= x.shape[ax]
    mean = x.mean(axes, keepdims=True, dtype=x.dtype)
    diff = x - mean
    var = (diff * diff).mean(axes, keepdims=True, dtype=x.dtype)
    inv = 1.0 / np.sqrt(var + eps)
    xhat = diff * inv
    if gamma is not None:
        dgamma = (gy * xhat).sum(axes, keepdims=True, dtype=x.dtype)
        dbeta = gy.sum(axes, keepdims=True, dtype=x.dtype)
        gxhat = gy * gamma
    else:
        dgamma = dbeta = None
        gxhat = gy
    gx = inv * (
        gxhat
        - gxhat.mean(axes, keepdims=True, dtype=x.dtype)
        - xhat * (gxhat * xhat).mean(axes, keepdims=True, dtype=x.dtype)
    )
    return gx.astype(x.dtype), dgamma, dbeta


def batchnorm_eval(x, gamma, beta, rm, rv, eps):
    """Eval-mode BN against running stats."""
    out = (x - rm) / np.sqrt(rv + eps)
    if gamma is not None:
        out = out * gamma + beta
    return out.astype(x.dtype)


# ---------------------------------------------------------------- losses
def softmax_xent(logits, target, reduction="mean"):
    """Fused stable cross-entropy vs a (one-hot) target matrix."""
    m = logits.max(1, keepdims=True)
    shifted = logits - m
    logz = np.log(np.exp(shifted).sum(1, keepdims=True))
    total = (-(shifted - logz) * target).sum(dtype=logits.dtype)
    if reduction == "mean":
        total = total / logits.shape[0]
    return np.asarray(total, logits.dtype)


def softmax_xent_grad(logits, target, gy, reduction="mean"):
    e = np.exp(logits - logits.max(1, keepdims=True))
    p = e / e.sum(1, keepdims=True)
    g = (p * target.sum(1, keepdims=True) - target) * gy
    if reduction == "mean":
        g = g / logits.shape[0]
    return g.astype(logits.dtype)
