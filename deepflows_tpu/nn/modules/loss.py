"""Loss modules (reference: `DeepFlows/nn/modules/loss.py`).

All five reference losses, with the broken ones implemented: L1Loss (needed
``tensor.abs``), BCELoss (functional was a stub).  CrossEntropyLoss accepts
one-hot or integer targets.
"""

from __future__ import annotations

from ...tensor import Tensor
from .. import functional as F
from .module import Module

__all__ = ["L1Loss", "NLLLoss", "MSELoss", "BCELoss", "CrossEntropyLoss"]


class _Loss(Module):
    def __init__(self, reduction: str = "mean") -> None:
        super().__init__()
        assert reduction in {"mean", "sum", "none"}
        self.reduction = reduction

    def forward(self, input: Tensor, target: Tensor) -> Tensor:
        raise NotImplementedError


class L1Loss(_Loss):
    def forward(self, input: Tensor, target: Tensor) -> Tensor:
        return F.l1_loss(input, target, reduction=self.reduction)


class NLLLoss(_Loss):
    def forward(self, input: Tensor, target: Tensor) -> Tensor:
        return F.nll_loss(input, target, reduction=self.reduction)


class MSELoss(_Loss):
    def forward(self, input: Tensor, target: Tensor) -> Tensor:
        return F.mse_loss(input, target, reduction=self.reduction)


class BCELoss(_Loss):
    def forward(self, input: Tensor, target: Tensor) -> Tensor:
        return F.binary_cross_entropy(input, target, reduction=self.reduction)


class CrossEntropyLoss(_Loss):
    """``ignore_index`` (torch semantics, integer targets only): those
    positions contribute zero loss and 'mean' divides by the non-ignored
    count — the SFT prompt-masking / padded-batch mechanism."""

    def __init__(self, reduction: str = "mean", ignore_index=None,
                 label_smoothing: float = 0.0) -> None:
        super().__init__(reduction)
        self.ignore_index = ignore_index
        self.label_smoothing = float(label_smoothing)

    def forward(self, input: Tensor, target: Tensor) -> Tensor:
        return F.cross_entropy(
            input, target, reduction=self.reduction,
            ignore_index=self.ignore_index,
            label_smoothing=self.label_smoothing,
        )


class LMHeadCrossEntropy(_Loss):
    """Fused LM-head + token cross-entropy: pair with a model that outputs
    HIDDEN states (e.g. ``TransformerLM.trunk()``) and pass the model's own
    ``head`` Linear here — the head matmul and the cross-entropy run as ONE
    Pallas kernel (``ops.pallas_kernels.fused_linear_ce``) that never
    materializes the (B, L, vocab) logits in HBM, forward or backward.
    That logits tensor is the dominant activation at large vocab (B·L·V
    floats, plus its softmax twin); here only the per-token loss and
    log-sum-exp (B·L floats) leave the kernel.

    Gradients flow to the hidden states AND the shared head Parameters
    (the head stays registered in the model tree, so the optimizer and
    checkpointing see it as usual).  No reference analog (CNN-only zoo).
    """

    def __init__(self, head, reduction: str = "mean"):
        super().__init__(reduction)
        # reference, not a child: the head belongs to the model's tree
        object.__setattr__(self, "_head", head)
        from ..jax_bridge import jax_function
        from ...ops.pallas_kernels import fused_linear_ce

        def _fn(x, w, b, t):
            return fused_linear_ce(x, w, b.reshape(-1), t)

        object.__setattr__(self, "_fused", jax_function(_fn))

    def forward(self, hidden: Tensor, target: Tensor) -> Tensor:
        d = hidden.shape[-1]
        n = 1
        for s in hidden.shape[:-1]:
            n *= s
        x = hidden.reshape((n, d)) if hidden.ndim != 2 else hidden
        t = target.reshape((n,)) if target.ndim != 1 else target
        loss = self._fused(x, self._head.weight, self._head.bias, t)
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        return loss
