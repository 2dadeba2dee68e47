"""Mixture-of-Experts FFN (dense softmax gating; no reference analog).

Design for expert parallelism the same way the rest of `parallel/` works —
by layout, not transport: the E experts' FFN weights are STACKED on a
leading expert axis (``experts_w1: (E, D, H)`` ...), every expert's output
is computed with ONE broadcast batched matmul (``(1, N, D) @ (E, D, H)``
— the MXU path), and the gate-weighted combine contracts the expert axis.
Shard the stacked weights ``P('expert')`` (see
``parallel.expert_parallel_rules``) and GSPMD turns the combine into a
``psum`` over the expert axis — each device computes only its experts.

Three gating modes: dense softmax mixture (default), masked-renormalised
top-k (``top_k=``), and Switch-style sparse top-1 dispatch with a static
capacity (``capacity_factor=`` — true sparse compute via einsum dispatch,
running as one ``nn.jax_function`` tape node).
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
        top_k: int = 0,
        capacity_factor: float = 0.0,
        device=None,
    ) -> None:
        """``top_k > 0`` enables top-k gating: the softmax gates are masked
        to each token's k largest and renormalised (the standard sparse-MoE
        semantics; the mask is a constant w.r.t. autodiff, so gradients
        flow through the surviving gate values only).  Compute stays dense
        — every expert runs every token on the MXU.  ``top_k=0`` (default)
        is the dense softmax mixture.

        ``capacity_factor > 0`` switches to SPARSE top-1 dispatch
        (Switch-Transformer semantics, one ``jax_function`` tape node):
        each token routes to its argmax expert weighted by the RAW top
        gate (not renormalised), each expert processes at most
        ``C = ceil(N/E * capacity_factor)`` tokens per batch (static
        shape), and tokens over capacity are dropped (zero MoE output).
        Compute per expert is ``(E, C, D)`` einsum-dispatched — the true
        sparse-compute path; mutually exclusive with ``top_k``."""
        super().__init__()
        import math

        if top_k < 0 or top_k > n_experts:
            raise ValueError(f"top_k={top_k} out of range for {n_experts} experts")
        if capacity_factor < 0:
            raise ValueError(f"capacity_factor must be >= 0, got {capacity_factor}")
        if capacity_factor and top_k:
            raise ValueError("capacity_factor and top_k are mutually exclusive")
        self.dim, self.hidden, self.n_experts = dim, hidden, n_experts
        self.activation = activation
        self.top_k = top_k
        self.capacity_factor = float(capacity_factor)
        self._sparse_fn = None
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
        # kaiming-uniform(a=sqrt(5)) with the PER-EXPERT 2-D fan: calling
        # kaiming_uniform_ on the (E, D, H) stack would treat dims>2 as a
        # conv receptive field (fan_in = D*H) and shrink the bound by
        # sqrt(H) vs the per-expert Linear equivalent (ADVICE r2).  For
        # a=sqrt(5), bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in).
        init.uniform_(self.experts_w1, -1.0 / math.sqrt(dim), 1.0 / math.sqrt(dim))
        init.uniform_(
            self.experts_w2, -1.0 / math.sqrt(hidden), 1.0 / math.sqrt(hidden)
        )

    def forward(self, x):
        # x: (B, L, D) or (N, D)
        if self.capacity_factor:
            return self._sparse_forward(x)
        squeeze = x.ndim == 2
        if squeeze:
            B, D = x.shape
            N = B
        else:
            B, L, D = x.shape
            N = B * L
        gates = F.softmax(self.router(x), x.ndim - 1)  # (..., E)
        if self.top_k and self.top_k < self.n_experts:
            gates = self._topk_renorm(gates, x.ndim - 1)
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

    def _topk_renorm(self, gates, axis):
        """Mask gates to the per-token top-k and renormalise.  Built from
        iterative max + comparison masks (comparisons are no-grad consts in
        the tape, so the selection is autodiff-constant, as it should be);
        exact float ties — measure-zero for a softmax of a linear router —
        may select an extra expert."""
        from ...backend import BackendTensor
        from ...tensor import Tensor

        remaining = gates
        mask = None
        for _ in range(self.top_k):
            m = remaining.max(axis, True)
            # const (no-grad) 0/1 mask built at the array level so its dtype
            # MATCHES the gates (bf16 purity: a python-scalar cast would
            # promote the whole downstream combine to f32)
            sel_arr = (remaining.data.array == m.data.array).astype(
                gates.data.array.dtype
            )
            sel = Tensor(BackendTensor._wrap(sel_arr, gates.device))
            mask = sel if mask is None else mask + sel - mask * sel
            remaining = remaining * (1.0 - sel) - sel  # knock out selected
        kept = gates * mask
        return kept / kept.sum(axis, True)

    def _sparse_forward(self, x):
        if self._sparse_fn is None:
            import math

            import jax
            import jax.numpy as jnp

            from ..jax_bridge import jax_function

            E = self.n_experts
            cf = self.capacity_factor
            act = self.activation

            def fn(xa, rw, rb, w1, b1, w2, b2):
                shape = xa.shape
                D = shape[-1]
                xf = xa.reshape(-1, D)
                N = xf.shape[0]
                C = max(1, int(math.ceil(N / E * cf)))
                gates = jax.nn.softmax(xf @ rw + rb.reshape(-1), -1)  # (N,E)
                e_t = jnp.argmax(gates, -1)  # (N,) — routing is autodiff-const
                g_t = jnp.take_along_axis(gates, e_t[:, None], -1)[:, 0]
                # routing bookkeeping in f32 regardless of activation dtype:
                # a bf16 cumsum is inexact past 256 tokens (positions would
                # collide in capacity slots, silently merging tokens)
                onehot = jax.nn.one_hot(e_t, E, dtype=jnp.float32)  # (N,E)
                pos = (jnp.cumsum(onehot, 0) - 1.0) * onehot
                keep = jnp.where(pos < C, onehot, 0.0)
                posc = jnp.clip(pos, 0, C - 1).astype(jnp.int32)
                disp = (
                    keep[..., None] * jax.nn.one_hot(posc, C, dtype=jnp.float32)
                ).astype(xf.dtype)  # (N,E,C)
                xe = jnp.einsum("nec,nd->ecd", disp, xf)
                h = jnp.einsum("ecd,edh->ech", xe, w1) + b1
                h = jax.nn.gelu(h, approximate=False) if act == "gelu" else jax.nn.relu(h)
                ye = jnp.einsum("ech,ehd->ecd", h, w2) + b2
                y = jnp.einsum("nec,ecd->nd", disp, ye) * g_t[:, None]
                return y.reshape(shape)

            self._sparse_fn = jax_function(fn)
        return self._sparse_fn(
            x,
            self.router.weight,
            self.router.bias,
            self.experts_w1,
            self.experts_b1,
            self.experts_w2,
            self.experts_b2,
        )

    def extra_repr(self) -> str:
        if self.capacity_factor:
            gate = f"switch-top1(capacity_factor={self.capacity_factor})"
        elif self.top_k:
            gate = f"top{self.top_k}"
        else:
            gate = "dense-softmax"
        return (
            f"dim={self.dim}, hidden={self.hidden}, "
            f"n_experts={self.n_experts}, gating={gate}"
        )
