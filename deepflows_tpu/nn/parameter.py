"""Parameter (reference: `DeepFlows/nn/parameter.py:5-34`): a Tensor that is
always grad-tracked."""

from __future__ import annotations

from ..tensor import Tensor


class Parameter(Tensor):
    def __init__(self, data, name=None):
        if isinstance(data, Tensor):
            super().__init__(
                data.data, device=data.device, name=name, requires_grad=True
            )
        else:
            super().__init__(data, name=name, requires_grad=True)
        # a Parameter ALWAYS requires grad, even if constructed while the
        # global grad flag is off (e.g. a model built after model.eval(),
        # which flips the process-global flag) — otherwise training would
        # silently update nothing
        self.requires_grad = True

    def __repr__(self):
        return f"Parameter({self.data}, device={self.device})"
