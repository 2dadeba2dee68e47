"""cpu_native kernel module: ctypes bindings over the compiled C++ library.

Architecture mirror of the reference's native extension
(`DeepFlows/backend/backend_src/ndarray_backend_cuda.cu` + its pybind11
module): a compiled kernel library behind a registered BackendDevice.  The
library is built on demand with the checked-in Makefile (g++ is baked into
the image; pybind11 is not, hence ctypes).

Protocol: same as numpy_kernels / jax_kernels.  Hot kernels (elementwise,
matmul, trailing-axis reductions) run in C; layout/view ops and convs
delegate to the NumPy implementation (views are metadata, and the conv path
is im2col + the C SGEMM via ``matmul``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..config import config
from . import numpy_kernels as _np_k

name = "cpu_native"
is_jax = False
xp = np

_HERE = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_HERE, "libdeepflows_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _HERE],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    f32 = ctypes.c_float
    sigs = {
        "nat_fill": [f32p, f32, i64],
        "nat_ewise_add": [f32p, f32p, f32p, i64],
        "nat_ewise_sub": [f32p, f32p, f32p, i64],
        "nat_ewise_mul": [f32p, f32p, f32p, i64],
        "nat_ewise_div": [f32p, f32p, f32p, i64],
        "nat_ewise_maximum": [f32p, f32p, f32p, i64],
        "nat_ewise_eq": [f32p, f32p, f32p, i64],
        "nat_ewise_ge": [f32p, f32p, f32p, i64],
        "nat_scalar_add": [f32p, f32, f32p, i64],
        "nat_scalar_mul": [f32p, f32, f32p, i64],
        "nat_scalar_div": [f32p, f32, f32p, i64],
        "nat_scalar_power": [f32p, f32, f32p, i64],
        "nat_scalar_maximum": [f32p, f32, f32p, i64],
        "nat_scalar_eq": [f32p, f32, f32p, i64],
        "nat_scalar_ge": [f32p, f32, f32p, i64],
        "nat_ewise_log": [f32p, f32p, i64],
        "nat_ewise_exp": [f32p, f32p, i64],
        "nat_ewise_tanh": [f32p, f32p, i64],
        "nat_matmul": [f32p, f32p, f32p, i64, i64, i64],
        "nat_reduce_sum": [f32p, f32p, i64, i64],
        "nat_reduce_max": [f32p, f32p, i64, i64],
        "nat_im2col": [f32p, f32p] + [i64] * 10,
        "nat_max_pool2d": [f32p, f32p] + [i64] * 9,
        "nat_batchnorm_train": [f32p, f32p, f32p, f32p, f32p, f32p, i64, i64, i64, f32],
    }
    for fname, argtypes in sigs.items():
        fn = getattr(lib, fname)
        fn.argtypes = argtypes
        fn.restype = None
    lib.nat_version.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


# ------------------------------------------------------------- protocol
manual_seed = _np_k.manual_seed
randn = _np_k.randn
rand = _np_k.rand
uniform = _np_k.uniform
randint = _np_k.randint
dropout_mask = _np_k.dropout_mask
one_hot = _np_k.one_hot
setitem = _np_k.setitem
astype = _np_k.astype
scatter_add = _np_k.scatter_add
from_numpy = _np_k.from_numpy
to_numpy = _np_k.to_numpy
device_put = _np_k.device_put
conv1d = _np_k.conv1d
conv1d_grad = _np_k.conv1d_grad
max_pool2d_grad = _np_k.max_pool2d_grad
avg_pool2d = _np_k.avg_pool2d
avg_pool2d_grad = _np_k.avg_pool2d_grad
max_pool1d = _np_k.max_pool1d
max_pool1d_grad = _np_k.max_pool1d_grad
avg_pool1d = _np_k.avg_pool1d
avg_pool1d_grad = _np_k.avg_pool1d_grad
conv2d_grad = _np_k.conv2d_grad
batchnorm_grad = _np_k.batchnorm_grad
softmax_xent = _np_k.softmax_xent
softmax_xent_grad = _np_k.softmax_xent_grad
batchnorm_eval = _np_k.batchnorm_eval


def max_pool2d(x, kernel_size, stride=None, padding=0):
    """Threaded C max pool (f32 NCHW); NumPy fallback otherwise."""
    x = np.asarray(x)
    if x.dtype != np.float32 or x.ndim != 4:
        return _np_k.max_pool2d(x, kernel_size, stride, padding)
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    stride = stride or kernel_size
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    if ph or pw:
        x = np.pad(
            x, ((0, 0), (0, 0), (ph, ph), (pw, pw)),
            constant_values=-np.inf,
        ).astype(np.float32)
    n, c, h, w = x.shape
    oh, ow = (h - kh) // sh + 1, (w - kw) // sw + 1
    out = np.empty((n, c, oh, ow), np.float32)
    xc = _f32(x)  # keep the contiguous buffer alive across the C call
    _load().nat_max_pool2d(
        _ptr(xc), _ptr(out), n * c, h, w, kh, kw, sh, sw, oh, ow
    )
    return out


def batchnorm_train(x, gamma, beta, axes, eps):
    """Threaded C batch norm over NCHW (axes (0,2,3)); NumPy fallback for
    other layouts."""
    x = np.asarray(x)
    if x.dtype != np.float32 or x.ndim != 4 or tuple(axes) != (0, 2, 3):
        return _np_k.batchnorm_train(x, gamma, beta, axes, eps)
    n, c, h, w = x.shape
    xc = _f32(x)
    out = np.empty_like(xc)
    mean = np.empty(c, np.float32)
    var = np.empty(c, np.float32)
    g = _f32(gamma).reshape(-1) if gamma is not None else None
    b = _f32(beta).reshape(-1) if beta is not None else None
    null = ctypes.POINTER(ctypes.c_float)()
    _load().nat_batchnorm_train(
        _ptr(xc),
        _ptr(g) if g is not None else null,
        _ptr(b) if b is not None else null,
        _ptr(out), _ptr(mean), _ptr(var),
        n, c, h * w, float(eps),
    )
    keep = (1, c, 1, 1)
    return out, mean.reshape(keep), var.reshape(keep)


def fill(shape, value, dtype=None):
    dtype = dtype or config.default_dtype
    if np.dtype(dtype) != np.float32:
        return np.full(shape, value, dtype=dtype)
    out = np.empty(shape, dtype=np.float32)
    _load().nat_fill(_ptr(out), float(value), out.size)
    return out


def _ewise(fname, a, b):
    a, b = _f32(a), _f32(b)
    assert a.shape == b.shape
    out = np.empty_like(a)
    getattr(_load(), fname)(_ptr(a), _ptr(b), _ptr(out), a.size)
    return out


def ewise_add(a, b):
    return _ewise("nat_ewise_add", a, b)


def ewise_sub(a, b):
    return _ewise("nat_ewise_sub", a, b)


def ewise_mul(a, b):
    return _ewise("nat_ewise_mul", a, b)


def ewise_div(a, b):
    return _ewise("nat_ewise_div", a, b)


def ewise_maximum(a, b):
    return _ewise("nat_ewise_maximum", a, b)


def ewise_eq(a, b):
    return _ewise("nat_ewise_eq", a, b)


def ewise_ge(a, b):
    return _ewise("nat_ewise_ge", a, b)


def _scalar(fname, a, val):
    a = _f32(a)
    out = np.empty_like(a)
    getattr(_load(), fname)(_ptr(a), float(val), _ptr(out), a.size)
    return out


def scalar_add(a, val):
    return _scalar("nat_scalar_add", a, val)


def scalar_mul(a, val):
    return _scalar("nat_scalar_mul", a, val)


def scalar_div(a, val):
    return _scalar("nat_scalar_div", a, val)


def scalar_power(a, val):
    return _scalar("nat_scalar_power", a, val)


def scalar_maximum(a, val):
    return _scalar("nat_scalar_maximum", a, val)


def scalar_eq(a, val):
    return _scalar("nat_scalar_eq", a, val)


def scalar_ge(a, val):
    return _scalar("nat_scalar_ge", a, val)


def _unary(fname, a):
    a = _f32(a)
    out = np.empty_like(a)
    getattr(_load(), fname)(_ptr(a), _ptr(out), a.size)
    return out


def ewise_log(a):
    return _unary("nat_ewise_log", a)


def ewise_exp(a):
    return _unary("nat_ewise_exp", a)


def ewise_tanh(a):
    return _unary("nat_ewise_tanh", a)


def matmul(a, b):
    """2-D through the C SGEMM; batched/1-D fall back to NumPy."""
    if (
        getattr(a, "ndim", 0) == 2
        and getattr(b, "ndim", 0) == 2
        and a.dtype == np.float32
        and b.dtype == np.float32
    ):
        a = np.ascontiguousarray(a)
        b = np.ascontiguousarray(b)
        m, n = a.shape
        n2, p = b.shape
        assert n == n2
        out = np.empty((m, p), dtype=np.float32)
        _load().nat_matmul(_ptr(a), _ptr(b), _ptr(out), m, n, p)
        return out
    return np.matmul(a, b)


def _reduce(fname, a, axis, keepdims):
    if a.dtype != np.float32 or axis is None:
        return None  # caller falls back
    axes = (axis,) if isinstance(axis, int) else tuple(axis)
    axes = tuple(ax % a.ndim for ax in axes)
    # only a contiguous trailing block is kernel-friendly
    if axes != tuple(range(a.ndim - len(axes), a.ndim)):
        return None
    a = np.ascontiguousarray(a)
    reduce_size = int(np.prod([a.shape[ax] for ax in axes])) or 1
    out_shape = a.shape[: a.ndim - len(axes)]
    out = np.empty(out_shape, dtype=np.float32)
    getattr(_load(), fname)(
        _ptr(a), _ptr(out), int(out.size), reduce_size
    )
    if keepdims:
        out = out.reshape(out_shape + (1,) * len(axes))
    return out


def reduce_sum(a, axis=None, keepdims=False):
    out = _reduce("nat_reduce_sum", np.asarray(a), axis, keepdims)
    if out is None:
        return np.sum(a, axis=axis, keepdims=keepdims)
    return out


def reduce_max(a, axis=None, keepdims=False):
    out = _reduce("nat_reduce_max", np.asarray(a), axis, keepdims)
    if out is None:
        return np.max(a, axis=axis, keepdims=keepdims)
    return out


def conv2d(x, w, stride=1, padding=0, groups=1):
    """C im2col (threaded, one fused gather) + threaded C SGEMM (groups=1,
    float32); NumPy fallback otherwise."""
    if groups != 1 or np.asarray(x).dtype != np.float32:
        return _np_k.conv2d(x, w, stride, padding, groups)
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    xpad = _f32(_np_k._pad_nchw(x, ph, pw))
    co, ci, kh, kw = w.shape
    n, _, h, w_ = xpad.shape
    oh, ow = (h - kh) // sh + 1, (w_ - kw) // sw + 1
    cols2 = np.empty((n * oh * ow, ci * kh * kw), np.float32)
    _load().nat_im2col(
        _ptr(xpad), _ptr(cols2), n, ci, h, w_, kh, kw, sh, sw, oh, ow
    )
    w2 = np.ascontiguousarray(np.asarray(w).reshape(co, ci * kh * kw).T)
    y = matmul(cols2, w2)  # (N*oh*ow, co)
    return np.ascontiguousarray(
        y.reshape(n, oh, ow, co).transpose(0, 3, 1, 2)
    )
