"""Embedding lookup (torch semantics; no reference analog — shipped for
sequence models).  The lookup is the tape's integer-array ``__getitem__``
(an XLA gather), whose backward is the tape's scatter-add slice gradient —
both already traceable, so embeddings train inside ``CompiledTrainStep``
like every other parameter."""

from __future__ import annotations

from ... import tensor
from ...backend import Device, default_accelerator
from ...tensor import Tensor
from .. import init
from ..parameter import Parameter
from .module import Module

import numpy as np


class Embedding(Module):
    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        device=None,
        dtype=None,
    ) -> None:
        super().__init__()
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.device = Device(device) if device else default_accelerator()
        self.weight = Parameter(
            tensor.empty(
                (num_embeddings, embedding_dim), dtype=dtype, device=self.device
            )
        )
        init.normal_(self.weight, 0.0, 1.0)  # torch's N(0, 1) default

    def forward(self, idx):
        # pass a Tensor key through UNWRAPPED-less: get_slice keeps its
        # identity so ONNX export can emit a Gather fed by the graph input
        if not isinstance(idx, Tensor) and not hasattr(idx, "dtype"):
            idx = np.asarray(idx)
        return self.weight[idx]

    def extra_repr(self) -> str:
        return f"{self.num_embeddings}, {self.embedding_dim}"
