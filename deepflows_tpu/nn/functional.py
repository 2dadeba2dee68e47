"""nn.functional — activations, losses, conv/pool ops on the autograd tape.

Rebuild of `DeepFlows/nn/functional.py` (406 LoC).  The conv/pool path is the
headline TPU translation: the reference lowers conv2d to an im2col slice-loop
plus a naive CUDA matmul (`functional.py:249-344`, SURVEY §3.1 hot loops);
here each conv/pool is ONE tape node whose forward/backward dispatch to the
device kernel module — `lax.conv_general_dilated` / `lax.reduce_window` on
TPU (MXU-tiled by XLA), im2col+tensordot on the NumPy device.  Backward uses
a per-node cache so one kernel call serves both parents' gradients.

Deliberate fixes vs the reference (SURVEY §7.1):
- conv backward scatter-ADDS overlapping windows (reference overwrote,
  `functional.py:285-294`);
- ``gelu`` is implemented (reference stub, `functional.py:38-40`);
- ``binary_cross_entropy`` is implemented (reference stub, `functional.py:100-101`);
- ``l1_loss`` works (reference called the commented-out ``tensor.abs``);
- ``cross_entropy`` accepts integer class targets in addition to the
  reference's one-hot targets (`functional.py:104-115`);
- dropout in eval mode is the identity (the reference multiplied by (1-p)
  on top of train-time inverted scaling, `dropout.py:33`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import tensor
from ..autograd import is_grad_enable, no_grad
from ..backend import BackendTensor
from ..tensor import Tensor, UnaryOperator


# ------------------------------------------------------------------ linear
class _FusedLinearOp(Tensor):
    """One-kernel Pallas y = x @ W + b (opt-in via config.use_pallas);
    closed-form grads: gx = g Wᵀ, gW = xᵀ g, gb = Σ₀ g (via unbroadcast)."""

    def __init__(self, x: Tensor, w: Tensor, b: Tensor):
        from ..ops.pallas_kernels import linear_fused

        out = BackendTensor._wrap(
            linear_fused(x.data.array, w.data.array, b.data.array), x.device
        )
        super().__init__(
            out,
            device=x.device,
            requires_grad=is_grad_enable()
            and (x.requires_grad or w.requires_grad or b.requires_grad),
        )
        self._x, self._w, self._b = x, w, b
        if self.requires_grad:
            x.build_edge(self)
            w.build_edge(self)
            b.build_edge(self)

    def grad_fn(self, node, grad):
        if node is self._x:
            return BackendTensor._wrap(
                grad.array @ self._w.data.array.T, self.device
            )
        if node is self._w:
            return BackendTensor._wrap(
                self._x.data.array.T @ grad.array, self.device
            )
        return grad  # bias: generic unbroadcast reduces (M,N) -> (1,N)


def linear(input: Tensor, weight: Tensor, bias: Optional[Tensor] = None) -> Tensor:
    """y = x @ W (+ b); weight is (in_features, out_features), the
    reference's convention (`DeepFlows/nn/modules/linear.py:40`).

    With ``config.use_pallas`` on the jax device (eager, f32, 2-D input),
    the whole affine runs as ONE hand-written Pallas kernel."""
    from ..config import config

    if (
        config.use_pallas
        and bias is not None
        and getattr(input.device, "is_jax", False)
        and input.ndim == 2
        and str(input.dtype) == "float32"
        and not _is_tracer(input)
        # lazy mode: the fragment's whole-step XLA program fuses the affine
        # anyway; the hand-called Pallas kernel would force materialization
        and not getattr(input.data.array, "_is_lazy", False)
    ):
        return _FusedLinearOp(input, weight, bias)
    affine = input @ weight
    if bias is not None:
        affine = affine + bias
    return affine


def _is_tracer(t: Tensor) -> bool:
    import jax

    return isinstance(t.data.array, jax.core.Tracer)


# ------------------------------------------------------------------ activations
def relu(input: Tensor) -> Tensor:
    return tensor.maximum(input, 0.0)


def relu6(input: Tensor) -> Tensor:
    """min(max(x, 0), 6) — the MobileNet activation (no reference analog)."""
    return tensor.minimum(tensor.maximum(input, 0.0), 6.0)


class sigmoid(UnaryOperator):
    """Numerically-split sigmoid (reference `functional.py:19-27`)."""

    def forward(self, x):
        d = x.data
        xp = d.device.xp
        z = xp.exp(-xp.abs(d.array))
        out = xp.where(d.array >= 0, 1.0 / (1.0 + z), z / (1.0 + z))
        return BackendTensor._wrap(out.astype(d.array.dtype), d.device)

    def grad_fn(self, x, grad):
        return grad * self.data * (1.0 - self.data)


class silu(UnaryOperator):
    """x * sigmoid(x) (no reference analog — shipped for the SwiGLU MLP of
    the Llama family, `models/llama.py`).  One tape node: the sigmoid is
    recomputed from the saved output-free form in grad (d/dx = s + x·s·(1−s))."""

    def forward(self, x):
        d = x.data
        xp = d.device.xp
        z = xp.exp(-xp.abs(d.array))
        s = xp.where(d.array >= 0, 1.0 / (1.0 + z), z / (1.0 + z))
        self._s = BackendTensor._wrap(s.astype(d.array.dtype), d.device)
        return BackendTensor._wrap(
            (d.array * s).astype(d.array.dtype), d.device
        )

    def grad_fn(self, x, grad):
        s = self._s
        return grad * (s + x.data * s * (1.0 - s))


class topk_mask(UnaryOperator):
    """0/1 mask selecting each row's top-k entries along the LAST axis
    (ties at the k-th value keep every tied entry).  Autodiff-constant by
    design — gradients flow through what the mask multiplies, not the
    selection (Switch-Transformer routing semantics, `nn/modules/moe.py`).
    A first-class tape node (rather than a severed constant) so the MoE
    routing stays input-dependent in exported ONNX graphs (TopK + Greater
    OrEqual + Cast)."""

    def __init__(self, input: Tensor, k: int):
        self.k = int(k)
        super().__init__(input)

    def forward(self, x):
        d = x.data
        xp = d.device.xp
        a = d.array
        if not (1 <= self.k <= a.shape[-1]):
            raise ValueError(f"k={self.k} out of range for axis {a.shape[-1]}")
        kth = xp.sort(a, axis=-1)[..., a.shape[-1] - self.k, None]
        return BackendTensor._wrap((a >= kth).astype(a.dtype), d.device)

    def grad_fn(self, x, grad):
        return grad * 0.0  # selection is autodiff-constant


class tanh(UnaryOperator):
    def forward(self, x):
        return x.data.tanh()

    def grad_fn(self, x, grad):
        return grad * (1.0 - self.data * self.data)


class gelu(UnaryOperator):
    """GELU, exact (erf) or tanh-approximate — implemented, unlike the
    reference's empty stub (`functional.py:38-40`)."""

    def __init__(self, input: Tensor, approximate: str = "none"):
        self.approximate = approximate
        super().__init__(input)

    def forward(self, x):
        d = x.data
        xp = d.device.xp
        a = d.array
        if self.approximate == "tanh":
            c = np.sqrt(2.0 / np.pi).astype(np.float32)
            inner = c * (a + 0.044715 * a**3)
            out = 0.5 * a * (1.0 + xp.tanh(inner))
        else:
            out = 0.5 * a * (1.0 + _erf(xp, a / np.float32(np.sqrt(2.0))))
        return BackendTensor._wrap(out.astype(a.dtype), d.device)

    def grad_fn(self, x, grad):
        d = x.data
        xp = d.device.xp
        a = d.array
        if self.approximate == "tanh":
            c = np.float32(np.sqrt(2.0 / np.pi))
            inner = c * (a + 0.044715 * a**3)
            t = xp.tanh(inner)
            dinner = c * (1.0 + 3 * 0.044715 * a**2)
            g = 0.5 * (1.0 + t) + 0.5 * a * (1.0 - t**2) * dinner
        else:
            cdf = 0.5 * (1.0 + _erf(xp, a / np.float32(np.sqrt(2.0))))
            pdf = xp.exp(-0.5 * a**2) / np.float32(np.sqrt(2.0 * np.pi))
            g = cdf + a * pdf
        return grad * BackendTensor._wrap(g.astype(a.dtype), d.device)


def _erf(xp, a):
    if xp is np:
        from scipy.special import erf as _scipy_erf

        return _scipy_erf(a)
    import jax

    return jax.lax.erf(a)


def leaky_relu(input: Tensor, negative_slope: float = 0.01) -> Tensor:
    return tensor.maximum(input, input * negative_slope)


def softmax(input: Tensor, dim=None, keepdims: bool = False) -> Tensor:
    """``keepdims`` is accepted for reference-signature parity
    (`DeepFlows/nn/functional.py:47`) but has no effect — softmax preserves
    the input shape by construction."""
    if dim is None:
        dim = 1
    m = tensor.max(input, dim, True)
    shifted = input - m
    e = tensor.exp(shifted)
    return e / tensor.sum(e, dim, True)


def log_softmax(input: Tensor, dim=None, keepdims: bool = False) -> Tensor:
    if dim is None:
        dim = 1
    m = tensor.max(input, dim, True)
    shifted = input - m
    logsumexp = tensor.log(tensor.sum(tensor.exp(shifted), dim, True))
    return shifted - logsumexp


# ------------------------------------------------------------------ losses
def _reduce(loss: Tensor, reduction: str) -> Tensor:
    if reduction == "mean":
        return tensor.mean(loss)
    if reduction == "sum":
        return tensor.sum(loss)
    if reduction == "none":
        return loss
    raise ValueError("reduction must be 'mean', 'sum' or 'none'")


def l1_loss(input: Tensor, target: Tensor, reduction: str = "mean") -> Tensor:
    return _reduce(tensor.abs(input - target), reduction)


def mse_loss(input: Tensor, target: Tensor, reduction: str = "mean") -> Tensor:
    return _reduce(tensor.square(input - target), reduction)


def nll_loss(input: Tensor, target: Tensor, reduction: str = "mean") -> Tensor:
    """-input * target with one-hot target (reference `functional.py:76-87`)."""
    target = _maybe_one_hot(target, input)
    return _reduce(-input * target, reduction)


def binary_cross_entropy(
    input: Tensor, target: Tensor, reduction: str = "mean", eps: float = 1e-7
) -> Tensor:
    p = tensor.maximum(tensor.minimum(input, 1.0 - eps), eps)
    loss = -(target * tensor.log(p) + (1.0 - target) * tensor.log(1.0 - p))
    return _reduce(loss, reduction)


def _maybe_one_hot(target: Tensor, input: Tensor, dim: int = 1,
                   mask=None) -> Tensor:
    """Accept integer class-index targets by one-hotting them on device (the
    reference required pre-one-hot float targets).  The class axis of the
    one-hot is placed at ``dim`` to match the logits layout (torch-layout
    ``(B, C, H, W)`` targets ``(B, H, W)`` included).  ``mask`` (same shape
    as the integer target, 0/1) zeroes whole one-hot rows — the
    ``ignore_index`` mechanism: an all-zero target row contributes zero
    loss."""
    if not isinstance(target, Tensor):
        target = Tensor(target, device=input.device)
    if target.ndim == input.ndim and target.shape == input.shape:
        return target
    with no_grad():
        num_classes = input.shape[dim] if input.ndim > 1 else input.shape[-1]
        oh = input.device.mod.one_hot(
            target.data.array, num_classes, dtype=input.dtype
        )
        if mask is not None:
            oh = oh * mask[..., None].astype(oh.dtype)
        if input.ndim > 1 and dim != input.ndim - 1:
            # one_hot appends the class axis LAST; move it to ``dim``
            perm = list(range(input.ndim - 1))
            perm.insert(dim, input.ndim - 1)
            oh = oh.transpose(perm)
        return Tensor(BackendTensor._wrap(oh, input.device))


class _SoftmaxXentOp(Tensor):
    """Fused stable cross-entropy: ONE tape node (kernel softmax_xent /
    softmax_xent_grad) instead of the ~10 composed nodes of max/sub/exp/sum/
    log/mul/sum — the standard classification tail, fused like _BatchNormOp.
    ``target`` is a constant one-hot/weight matrix (raw array)."""

    def __init__(self, x: Tensor, target_arr, reduction: str):
        dev = x.device
        self.reduction = reduction
        self._target_arr = target_arr
        out = dev.softmax_xent(x.data.array, target_arr, reduction)
        super().__init__(
            BackendTensor._wrap(out, dev),
            device=dev,
            requires_grad=is_grad_enable() and x.requires_grad,
        )
        self._x = x
        if self.requires_grad:
            x.build_edge(self)

    def grad_fn(self, node, grad):
        gx = self.device.softmax_xent_grad(
            self._x.data.array, self._target_arr, grad.array, self.reduction
        )
        return BackendTensor._wrap(gx, self.device)


def cross_entropy(
    input: Tensor, target: Tensor, reduction: str = "mean", dim=None,
    ignore_index=None, label_smoothing: float = 0.0,
) -> Tensor:
    """Stable log-softmax cross-entropy vs one-hot (or integer) target;
    'mean' divides by the batch size (reference `functional.py:104-115`).

    Sequence extension (beyond the reference): class-LAST logits of any
    rank — ``(B, L, V)`` logits with ``(B, L)`` integer or ``(B, L, V)``
    one-hot targets flatten to the ``(N, V)`` fast path (the LM loss
    shape); ``reduction='none'`` then returns the per-token ``(B, L)``
    loss.  The flatten applies only when ``dim`` is unset or names the
    LAST axis — an explicit ``dim=1`` on >2-D input keeps the reference's
    torch-layout semantics untouched.  With ``dim=None`` the auto-flatten
    is limited to ndim==3 (the LM shape): a >3-D torch-layout input with
    coinciding dims (e.g. ``(B, 32, 32, 32)`` segmentation logits with 32
    classes) would otherwise silently softmax over the LAST axis instead
    of the class axis — rank >3 class-last inputs must opt in with an
    explicit ``dim=-1`` (ADVICE r2).

    ``ignore_index`` (torch semantics; integer targets only): positions
    whose target equals it contribute ZERO loss, and ``'mean'`` divides by
    the count of non-ignored positions — the SFT prompt-masking / padded-
    batch mechanism.  Trace-safe: the valid count may be a traced scalar
    inside compiled steps.

    ``label_smoothing`` (torch semantics): the one-hot target blends with
    the uniform distribution, ``(1 - eps) * onehot + eps / C`` — applied
    after ignore_index masking so ignored rows stay exactly zero."""
    seq_shape = None
    auto_ok = input.ndim == 3 if dim is None else dim in (-1, input.ndim - 1)
    if input.ndim > 2 and auto_ok:
        t_shape = (
            tuple(target.shape)
            if isinstance(target, Tensor)
            else tuple(np.asarray(target).shape)
        )
        flat_int = t_shape == tuple(input.shape[:-1])  # integer tokens
        flat_oh = t_shape == tuple(input.shape)  # one-hot / smoothed
        if flat_int or flat_oh:
            seq_shape = tuple(input.shape[:-1])
            V = input.shape[-1]
            n = 1
            for d in seq_shape:
                n *= d
            input = input.reshape(n, V)
            if isinstance(target, Tensor):
                target = target.reshape((n, V) if flat_oh else (n,))
            else:
                target = np.asarray(target).reshape(
                    (n, V) if flat_oh else (n,)
                )
            dim = 1
    if dim is None:
        dim = 1
    if seq_shape is not None and reduction == "none":
        flat = cross_entropy(input, target, "none", dim,
                             ignore_index=ignore_index,
                             label_smoothing=label_smoothing)
        return flat.reshape(seq_shape)
    dim = dim % input.ndim if input.ndim else 0
    valid = None
    if ignore_index is not None:
        raw = (
            target.data.array if isinstance(target, Tensor)
            else np.asarray(target)
        )
        if raw.ndim == input.ndim and tuple(raw.shape) == tuple(input.shape):
            raise ValueError(
                "ignore_index requires integer class-index targets"
            )
        valid = raw != ignore_index
        # ignored ids -> class 0 for the one-hot; the row is zeroed by mask
        target = _maybe_one_hot(raw * valid, input, dim, mask=valid)
    else:
        target = _maybe_one_hot(target, input, dim)
    if label_smoothing:
        C = input.shape[dim]
        smooth = target * (1.0 - label_smoothing) + label_smoothing / C
        if valid is not None:
            # keep ignored rows all-zero (their one-hot row is zero, but
            # the additive eps/C term would resurrect them)
            from ..backend import BackendTensor as _BT

            vm = valid
            # broadcast valid over the class axis at ``dim``
            expand = list(vm.shape)
            expand.insert(dim, 1)
            mask_t = Tensor(_BT._wrap(
                vm.reshape(expand).astype("float32"), input.device
            ))
            smooth = smooth * mask_t
        target = smooth

    def _mean_by_valid(loss_sum):
        n_valid = valid.sum()
        if hasattr(n_valid, "aval"):  # traced under jit
            import jax.numpy as jnp

            n_t = Tensor(BackendTensor._wrap(
                jnp.maximum(n_valid, 1).astype(jnp.float32), input.device
            ))
            return loss_sum / n_t
        return loss_sum * (1.0 / max(int(n_valid), 1))

    if (
        input.ndim == 2
        and dim == 1
        and reduction in ("mean", "sum")
        and not target.requires_grad
    ):
        if valid is not None and reduction == "mean":
            return _mean_by_valid(
                _SoftmaxXentOp(input, target.data.array, "sum")
            )
        return _SoftmaxXentOp(input, target.data.array, reduction)
    m = tensor.max(input, dim, True)
    shifted = input - m
    log_sum_exp = tensor.log(tensor.sum(tensor.exp(shifted), dim, True))
    nll = -(shifted - log_sum_exp) * target
    if valid is not None and reduction == "mean":
        return _mean_by_valid(tensor.sum(nll))
    if reduction == "mean":
        # divide by the number of POSITIONS (all non-class axes): for 2-D
        # this is the batch size (reference `functional.py:113`); for
        # torch-layout rank>2 it matches torch's per-position mean
        n = 1
        for a, d in enumerate(input.shape):
            if a != dim:
                n *= d
        return tensor.sum(nll) * (1.0 / n)
    if reduction == "sum":
        return tensor.sum(nll)
    if reduction == "none":
        return tensor.sum(nll, dim)
    raise ValueError("reduction must be 'mean', 'sum' or 'none'")


# ------------------------------------------------------------------ dropout
def dropout(input: Tensor, p: float = 0.5, training: bool = True) -> Tensor:
    if not training or p == 0.0:
        return input
    from .. import random as df_random

    dev = input.device
    if getattr(dev, "is_jax", False):
        mask = dev.dropout_mask(
            input.shape, 1.0 - p, dtype=input.dtype, key=df_random.next_key()
        )
    else:
        mask = dev.dropout_mask(input.shape, 1.0 - p, dtype=input.dtype)
    return input * Tensor(BackendTensor._wrap(mask, dev))


# ------------------------------------------------------------------ conv ops
class _BatchNormOp(Tensor):
    """One tape node for train-mode batch norm (x[, weight, bias] parents).

    The composed formula costs ~10 tape nodes per BN layer (the reference
    builds it from single-axis sums, `DeepFlows/nn/modules/batchnorm.py:31-47`);
    this node runs the fused ``batchnorm_train`` kernel forward and the fused
    ``batchnorm_grad`` kernel backward (one cached device call serves all
    parents).  Batch mean/var are stashed on the node (``.mean``/``.var``,
    raw keepdims arrays) for the module's running-stats EMA."""

    def __init__(self, x: Tensor, weight, bias, axes, eps):
        dev = x.device
        self.axes, self.eps = tuple(axes), float(eps)
        w_arr = weight.data.array if weight is not None else None
        b_arr = bias.data.array if bias is not None else None
        out, mean, var = dev.batchnorm_train(
            x.data.array, w_arr, b_arr, self.axes, self.eps
        )
        # stash for the module's EMA; names must NOT shadow Tensor.mean/var
        self.batch_mean, self.batch_var = mean, var
        rg = is_grad_enable() and (
            x.requires_grad
            or (weight is not None and weight.requires_grad)
            or (bias is not None and bias.requires_grad)
        )
        super().__init__(BackendTensor._wrap(out, dev), device=dev, requires_grad=rg)
        self._x, self._w, self._b = x, weight, bias
        self._gcache = None
        if self.requires_grad:
            x.build_edge(self)
            if weight is not None:
                weight.build_edge(self)
            if bias is not None:
                bias.build_edge(self)

    def grad_fn(self, node, grad):
        if self._gcache is None or self._gcache[0] is not grad:
            w_arr = self._w.data.array if self._w is not None else None
            gx, gw, gb = self.device.batchnorm_grad(
                self._x.data.array, w_arr, grad.array, self.axes, self.eps
            )
            self._gcache = (grad, gx, gw, gb)
        _, gx, gw, gb = self._gcache
        if node is self._x:
            return BackendTensor._wrap(gx, self.device)
        if node is self._w:
            return BackendTensor._wrap(gw, self.device)
        return BackendTensor._wrap(gb, self.device)


def batch_norm(x: Tensor, weight, bias, axes, eps: float = 1e-5) -> Tensor:
    """Fused train-mode batch normalization over ``axes`` (biased variance,
    reference numerics `nn/modules/batchnorm.py:31-42`).  Returns the
    normalized tensor; batch stats are on the op node
    (``out.batch_mean``/``out.batch_var``)."""
    return _BatchNormOp(x, weight, bias, axes, eps)


class _ConvNd(Tensor):
    """One tape node per convolution; backward computes (gx, gw) in a single
    device call and caches for the second parent."""

    _fwd_name = "conv2d"
    _grad_name = "conv2d_grad"

    def __init__(self, x: Tensor, w: Tensor, stride, padding, groups):
        assert x.device is w.device, "conv operands on different devices"
        self.stride, self.padding, self.groups = stride, padding, groups
        dev = x.device
        out = getattr(dev, self._fwd_name)(
            x.data.array, w.data.array, stride, padding, groups
        )
        super().__init__(
            BackendTensor._wrap(out, dev),
            device=dev,
            requires_grad=is_grad_enable() and (x.requires_grad or w.requires_grad),
        )
        self._x, self._w = x, w
        self._gcache = None
        if self.requires_grad:
            x.build_edge(self)
            w.build_edge(self)

    def grad_fn(self, node, grad):
        if self._gcache is None or self._gcache[0] is not grad:
            gx, gw = getattr(self.device, self._grad_name)(
                self._x.data.array,
                self._w.data.array,
                grad.array,
                self.stride,
                self.padding,
                self.groups,
            )
            self._gcache = (grad, gx, gw)
        _, gx, gw = self._gcache
        if node is self._x:
            return BackendTensor._wrap(gx, self.device)
        return BackendTensor._wrap(gw, self.device)


class _Conv2dOp(_ConvNd):
    _fwd_name = "conv2d"
    _grad_name = "conv2d_grad"


class _Conv1dOp(_ConvNd):
    _fwd_name = "conv1d"
    _grad_name = "conv1d_grad"


def conv2d(
    x: Tensor,
    weight: Tensor,
    padding: int = 0,
    stride: int = 1,
    groups: int = 1,
) -> Tensor:
    """(N,Cin,H,W) × (Cout,Cin/groups,kh,kw) — argument order (padding,
    stride) matches the reference (`nn/modules/conv.py:104-108`).  ``groups``
    is an extension (reference had none) enabling true depthwise convs."""
    return _Conv2dOp(x, weight, stride, padding, groups)


def conv1d(
    x: Tensor,
    weight: Tensor,
    padding: int = 0,
    stride: int = 1,
    groups: int = 1,
) -> Tensor:
    return _Conv1dOp(x, weight, stride, padding, groups)


# ------------------------------------------------------------------ pool ops
class _PoolNd(UnaryOperator):
    _fwd_name = "max_pool2d"
    _grad_name = "max_pool2d_grad"

    def __init__(self, x: Tensor, kernel_size, stride, padding):
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size
        self.pad_ = padding
        super().__init__(x)

    def forward(self, x):
        out = getattr(x.device, self._fwd_name)(
            x.data.array, self.kernel_size, self.stride, self.pad_
        )
        return BackendTensor._wrap(out, x.device)

    def grad_fn(self, x, grad):
        gx = getattr(x.device, self._grad_name)(
            x.data.array, grad.array, self.kernel_size, self.stride, self.pad_
        )
        return BackendTensor._wrap(gx, x.device)


class _MaxPool2dOp(_PoolNd):
    _fwd_name, _grad_name = "max_pool2d", "max_pool2d_grad"


class _AvgPool2dOp(_PoolNd):
    _fwd_name, _grad_name = "avg_pool2d", "avg_pool2d_grad"


class _MaxPool1dOp(_PoolNd):
    _fwd_name, _grad_name = "max_pool1d", "max_pool1d_grad"


class _AvgPool1dOp(_PoolNd):
    _fwd_name, _grad_name = "avg_pool1d", "avg_pool1d_grad"


def max_pool2d(x: Tensor, kernel_size: int, stride: int = 0, padding: int = 0):
    return _MaxPool2dOp(x, kernel_size, stride or kernel_size, padding)


def avg_pool2d(x: Tensor, kernel_size: int, stride: int = 0, padding: int = 0):
    return _AvgPool2dOp(x, kernel_size, stride or kernel_size, padding)


def max_pool1d(x: Tensor, kernel_size: int, stride: int = 0, padding: int = 0):
    return _MaxPool1dOp(x, kernel_size, stride or kernel_size, padding)


def avg_pool1d(x: Tensor, kernel_size: int, stride: int = 0, padding: int = 0):
    return _AvgPool1dOp(x, kernel_size, stride or kernel_size, padding)


def adaptive_avg_pool2d(x: Tensor, output_size: int = 1) -> Tensor:
    """Global/adaptive average pool.  output_size=1 is GAP — the reference's
    models hand-roll it as two means (`test/ResNet.py:141-143`).  For other
    sizes, divisible inputs use one pooling kernel; non-divisible inputs use
    torch-style variable windows (floor/ceil bin edges)."""
    if output_size == 1:
        return tensor.mean(tensor.mean(x, 3, True), 2, True)
    n, c, h, w = x.shape
    o = output_size
    if h == o and w == o:
        return x
    if h % o == 0 and w % o == 0:
        # per-dim kernel/stride: rectangular inputs pool to o×o correctly
        return _AvgPool2dOp(x, (h // o, w // o), (h // o, w // o), 0)
    rows = []
    for i in range(o):
        h0, h1 = (i * h) // o, -(-((i + 1) * h) // o)
        cols = []
        for j in range(o):
            w0, w1 = (j * w) // o, -(-((j + 1) * w) // o)
            cols.append(
                tensor.mean(x[:, :, h0:h1, w0:w1], (2, 3), True)
            )
        rows.append(tensor.concat(cols, axis=3))
    return tensor.concat(rows, axis=2)


def flatten(x: Tensor, start_dim: int = 1) -> Tensor:
    return x.flatten(start_dim)


def one_hot(indices, num_classes: int, device=None) -> Tensor:
    from ..backend import Device, default_device

    dev = Device(device) if device else default_device()
    if isinstance(indices, Tensor):
        indices = indices.data.array
    with no_grad():
        return Tensor(BackendTensor._wrap(dev.mod.one_hot(indices, num_classes), dev))
