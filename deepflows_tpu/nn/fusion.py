"""Conv→BatchNorm folding for deployment artifacts.

torch-parity surface: ``torch.nn.utils.fusion.fuse_conv_bn_eval`` /
``torch.ao.quantization.fuse_modules``.  The reference has no fusion pass —
its eval BatchNorm pays a full per-op normalization round trip every forward
(`/root/reference/DeepFlows/nn/modules/batchnorm.py:47-53`).

NOT a TPU perf feature — measured (BENCH_NOTES "Conv→BN folding",
tools/fuse_infer.py): compiled eval forward is 0.99× after folding, because
whole-graph XLA already fuses the constant-stats BN affine into the conv
epilogue at compile time.  Per-op frameworks need this fold at runtime; an
XLA program does not.  What the fold buys HERE is the artifact: a BN-free
weight set (smaller state_dict, no BN ops in ONNX export, portability to
engines that do not fuse).

Unlike torch's FX-based auto-fuser this works on the framework's own eager
tape: one traced forward tags every Conv/Linear output with its producer and
counts its graph consumers, so a pair is folded only when the conv output
feeds the BatchNorm and nothing else.  No pattern list, no module-name
conventions — attribute-style blocks (ResNet's ``conv1``/``bn1``), Sequential
chains, and downsample branches are all discovered the same way.

Fold math (per out-channel c, eval-mode BN with running stats μ, σ²):

    s_c = γ_c / sqrt(σ²_c + eps)
    W'_c = W_c · s_c
    b'_c = (b_c − μ_c) · s_c + β_c

``WSConv2d`` is deliberately NOT folded: it re-standardizes its weight at
every call, which would erase the folded scale (its NF-ResNet host has no
BatchNorm anyway).
"""

from __future__ import annotations

import contextlib
import copy
from typing import Dict, List, Tuple

import numpy as np

from ..autograd import enable_grad, is_grad_enabled, set_grad_enabled
from ..backend import BackendTensor
from ..tensor import Graph, Tensor
from .modules import BatchNorm1d, BatchNorm2d, Conv1d, Conv2d, Identity, Linear
from .modules.module import Module
from .parameter import Parameter

__all__ = ["fuse_conv_bn"]


class _Trace:
    """One traced eval forward: producer map + call counts."""

    def __init__(self) -> None:
        self.producer: Dict[int, Module] = {}  # id(out tensor) -> conv/linear
        self.outputs: List[Tensor] = []  # keep alive so ids stay unique
        self.bn_input: Dict[int, List[Tensor]] = {}  # id(bn) -> inputs seen
        self.calls: Dict[int, int] = {}  # id(module) -> call count


@contextlib.contextmanager
def _tracing(trace: _Trace):
    orig = Module.__call__

    def traced(self, *args, **kwargs):
        trace.calls[id(self)] = trace.calls.get(id(self), 0) + 1
        if (
            type(self) in (BatchNorm1d, BatchNorm2d)
            and args
            and isinstance(args[0], Tensor)
        ):
            trace.bn_input.setdefault(id(self), []).append(args[0])
        out = orig(self, *args, **kwargs)
        # exact types only: WSConv2d subclasses Conv2d but re-standardizes
        # its weight per call, so a folded scale would not survive
        if type(self) in (Conv1d, Conv2d, Linear) and isinstance(out, Tensor):
            trace.producer[id(out)] = self
            trace.outputs.append(out)
        return out

    Module.__call__ = traced
    try:
        yield
    finally:
        Module.__call__ = orig


def _np(t) -> np.ndarray:
    return np.asarray(t.data.numpy(), dtype=np.float64)


def _assign(param, arr: np.ndarray) -> None:
    # BackendTensor casts the f64 fold result to the param's own dtype
    param.data = BackendTensor(arr, device=param.device, dtype=param.dtype)


def _fold(conv, bn) -> None:
    """Fold eval-mode ``bn`` into ``conv`` in place (f64 fold, cast back)."""
    c = bn.num_features
    mu = _np(bn.running_mean).reshape(c)
    var = _np(bn.running_var).reshape(c)
    gamma = _np(bn.weight).reshape(c) if bn.affine else np.ones(c)
    beta = _np(bn.bias).reshape(c) if bn.affine else np.zeros(c)
    s = gamma / np.sqrt(var + bn.eps)

    w = _np(conv.weight)
    if isinstance(conv, Linear):
        # weight (in, out): scale the OUT axis; bias (1, out)
        new_w = w * s[None, :]
        bias_shape = (1, c)
    else:
        # weight (out, in/groups, k[, k]): scale the OUT axis
        new_w = w * s.reshape((c,) + (1,) * (w.ndim - 1))
        bias_shape = (1, c) + (1,) * conv._dims
    b = _np(conv.bias).reshape(c) if conv.bias is not None else np.zeros(c)
    new_b = ((b - mu) * s + beta).reshape(bias_shape)

    _assign(conv.weight, new_w)
    if conv.bias is not None:
        _assign(conv.bias, new_b)
    else:
        ref = conv.weight
        conv.bias = Parameter(Tensor(new_b, device=ref.device, dtype=ref.dtype))


def fuse_conv_bn(model: Module, example_input, *, inplace: bool = False) -> Module:
    """Fold every eligible Conv/Linear→BatchNorm pair of ``model`` for eval.

    Runs ONE eager eval forward on ``example_input`` (a framework Tensor, or
    array-like placed on the model's device) to discover producer→BN pairs
    from the autograd graph, then rewrites the conv weights/bias with the BN
    statistics and replaces the BatchNorm with :class:`Identity`.

    A pair is folded only when ALL of:

    - the BatchNorm ran in eval with ``track_running_stats`` stats present,
    - both modules were called exactly once in the trace (no weight sharing),
    - the conv output tensor's ONLY graph consumer is the BatchNorm — a conv
      output that also feeds a residual branch keeps its BN.

    Returns the fused model (a deepcopy unless ``inplace=True``).  The fused
    model is numerically ``≈`` the eval forward of the original (exact up to
    one bf16/f32 rounding of the folded weights) and must not be trained
    further — BN statistics are frozen into the convs.
    """
    prev_grad = is_grad_enabled()  # model.eval() flips the GLOBAL grad flag
    if not inplace:
        model = copy.deepcopy(model)
    model.eval()  # fused models stay eval: BN statistics freeze into the convs

    if not isinstance(example_input, Tensor):
        dev = next(model.parameters()).device
        example_input = Tensor(np.asarray(example_input), device=dev)

    trace = _Trace()
    n_nodes = len(Graph.node_list)
    try:
        # model.eval() disables grad recording globally; the trace needs the
        # graph edges (consumer counts), so re-enable around the one forward
        with _tracing(trace), enable_grad():
            model(example_input)

        # parent map for BN replacement
        parent_of: Dict[int, Tuple[Module, str]] = {}
        for _, mod in model.named_modules():
            for name, child in mod.named_children():
                parent_of[id(child)] = (mod, name)

        for _, bn in list(model.named_modules()):
            if type(bn) not in (BatchNorm1d, BatchNorm2d):
                continue
            if bn.training or not bn.track_running_stats:
                continue
            if bn.running_mean is None or trace.calls.get(id(bn)) != 1:
                continue
            xs = trace.bn_input.get(id(bn), [])
            if len(xs) != 1:
                continue
            x = xs[0]
            conv = trace.producer.get(id(x))
            if conv is None or trace.calls.get(id(conv)) != 1:
                continue
            if len(x.children) != 1:
                continue  # conv output has other consumers
            _fold(conv, bn)
            parent, name = parent_of[id(bn)]
            setattr(parent, name, Identity())
    finally:
        # drop ONLY the trace's own nodes and edges: a caller may hold a
        # pending forward (loss not yet backwarded) whose graph must survive
        new_nodes = Graph.node_list[n_nodes:]
        if new_nodes:
            del Graph.node_list[n_nodes:]
            new_ids = set(map(id, new_nodes))
            touched = [
                p for n in new_nodes for p in n.parents if id(p) not in new_ids
            ]
            for p in touched:
                p.children[:] = [c for c in p.children if id(c) not in new_ids]
            for n in new_nodes:
                n.children.clear()
                n.parents.clear()
        # Module.eval() disables grad recording process-wide; fusing a
        # snapshot must not change the caller's grad mode
        set_grad_enabled(prev_grad)

    return model
