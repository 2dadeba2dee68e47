"""Mixture-of-Experts FFN (dense softmax gating; no reference analog).

Design for expert parallelism the same way the rest of `parallel/` works —
by layout, not transport: the E experts' FFN weights are STACKED on a
leading expert axis (``experts_w1: (E, D, H)`` ...), every expert's output
is computed with ONE broadcast batched matmul (``(1, N, D) @ (E, D, H)``
— the MXU path), and the gate-weighted combine contracts the expert axis.
Shard the stacked weights ``P('expert')`` (see
``parallel.expert_parallel_rules``) and GSPMD turns the combine into a
``psum`` over the expert axis — each device computes only its experts.

Gating is the dense softmax mixture (every expert sees every token,
weighted by the router); top-k sparse dispatch is a compute optimisation,
not a semantics change, and is deliberately left out of v1 — static-shape
capacity dispatch is noted in docs/DESIGN.md as the follow-up.
"""

from __future__ import annotations

from ... import tensor
from ...backend import Device, default_accelerator
from .. import functional as F
from .. import init
from ..parameter import Parameter
from .linear import Linear
from .module import Module


class MoE(Module):
    def __init__(
        self,
        dim: int,
        hidden: int,
        n_experts: int,
        activation: str = "gelu",
        device=None,
    ) -> None:
        super().__init__()
        import math

        self.dim, self.hidden, self.n_experts = dim, hidden, n_experts
        self.activation = activation
        dev = Device(device) if device else default_accelerator()
        self.router = Linear(dim, n_experts, device=device)
        self.experts_w1 = Parameter(
            tensor.empty((n_experts, dim, hidden), device=dev)
        )
        self.experts_b1 = Parameter(
            tensor.zeros((n_experts, 1, hidden), device=dev)
        )
        self.experts_w2 = Parameter(
            tensor.empty((n_experts, hidden, dim), device=dev)
        )
        self.experts_b2 = Parameter(
            tensor.zeros((n_experts, 1, dim), device=dev)
        )
        init.kaiming_uniform_(self.experts_w1, a=math.sqrt(5))
        init.kaiming_uniform_(self.experts_w2, a=math.sqrt(5))

    def forward(self, x):
        # x: (B, L, D) or (N, D)
        squeeze = x.ndim == 2
        if squeeze:
            B, D = x.shape
            N = B
        else:
            B, L, D = x.shape
            N = B * L
        gates = F.softmax(self.router(x), x.ndim - 1)  # (..., E)
        xf = x.reshape(1, N, D)
        h = xf @ self.experts_w1 + self.experts_b1  # (E, N, H)
        if self.activation == "gelu":
            h = F.gelu(h)
        else:
            h = F.relu(h)
        out_e = h @ self.experts_w2 + self.experts_b2  # (E, N, D)
        # combine: contract the expert axis with the gate weights
        g = gates.reshape(N, self.n_experts).transpose(1, 0).reshape(
            self.n_experts, N, 1
        )
        out = (out_e * g).sum(0)  # (N, D) — psum over 'expert' when sharded
        return out.reshape(B, D) if squeeze else out.reshape(B, L, D)

    def extra_repr(self) -> str:
        return (
            f"dim={self.dim}, hidden={self.hidden}, "
            f"n_experts={self.n_experts}, gating=dense-softmax"
        )
