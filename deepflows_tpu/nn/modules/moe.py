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
        swiglu: bool = False,
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
        sparse-compute path; mutually exclusive with ``top_k``.

        ``swiglu=True`` makes each expert a bias-free SwiGLU FFN
        (``down(silu(gate(x)) * up(x))`` — the Mixtral expert recipe;
        stacked ``experts_gate/up/down``, so ``expert_parallel_rules``
        shards them unchanged).  Dense/top-k gating only (the Mixtral
        top-2 semantics ARE the ``top_k`` path)."""
        super().__init__()
        import math

        if top_k < 0 or top_k > n_experts:
            raise ValueError(f"top_k={top_k} out of range for {n_experts} experts")
        if capacity_factor < 0:
            raise ValueError(f"capacity_factor must be >= 0, got {capacity_factor}")
        if capacity_factor and top_k:
            raise ValueError("capacity_factor and top_k are mutually exclusive")
        if swiglu and capacity_factor:
            raise ValueError(
                "swiglu experts support dense/top-k gating only "
                "(capacity_factor dispatch is the gelu/relu Switch path)"
            )
        self.dim, self.hidden, self.n_experts = dim, hidden, n_experts
        self.activation = activation
        self.top_k = top_k
        self.capacity_factor = float(capacity_factor)
        self._sparse_fn = None
        # per-forward aux losses/telemetry (see _record_aux); same-trace
        # reads only — never cache these across traces (they are tracers
        # inside a jit trace, CLAUDE.md omnistaging rule)
        self.last_aux_loss = None
        self.last_z_loss = None
        self.last_expert_fraction = None
        self.last_dropped_fraction = None
        self.swiglu = bool(swiglu)
        dev = Device(device) if device else default_accelerator()
        self.router = Linear(dim, n_experts, device=device)
        if self.swiglu:
            bound_d, bound_h = 1.0 / math.sqrt(dim), 1.0 / math.sqrt(hidden)
            for name, shape, bound in (
                ("experts_gate", (n_experts, dim, hidden), bound_d),
                ("experts_up", (n_experts, dim, hidden), bound_d),
                ("experts_down", (n_experts, hidden, dim), bound_h),
            ):
                par = Parameter(tensor.empty(shape, device=dev))
                init.uniform_(par, -bound, bound)
                self.register_parameter(name, par)
            return
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
        logits = self.router(x)  # (..., E)
        self._record_aux(logits, x.ndim - 1)
        self.last_dropped_fraction = None  # dense/top-k compute drops nothing
        gates = F.softmax(logits, x.ndim - 1)  # (..., E)
        if self.top_k and self.top_k < self.n_experts:
            gates = self._topk_renorm(gates, x.ndim - 1)
        xf = x.reshape(1, N, D)
        if self.swiglu:
            # Mixtral expert: down(silu(gate(x)) * up(x)), bias-free
            g = F.silu(xf @ self.experts_gate)  # (E, N, H)
            u = xf @ self.experts_up
            out_e = (g * u) @ self.experts_down  # (E, N, D)
        else:
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
        """Mask gates to the per-token top-k and renormalise.  The selection
        is one :class:`F.topk_mask` tape node (autodiff-constant, as it
        should be: gradients flow through the surviving gate values only;
        and a REAL tape node so ONNX export keeps routing input-dependent);
        exact float ties at the k-th value — measure-zero for a softmax of
        a linear router — may select an extra expert."""
        from .. import functional as F

        kept = gates * F.topk_mask(gates, self.top_k)
        return kept / kept.sum(axis, True)

    def _record_aux(self, logits, axis):
        """Switch-style auxiliary losses + routing telemetry, recorded on
        the module for the SAME tape/trace (read them through
        :class:`MoECriterion` inside the step that ran this forward; they
        are overwritten every forward and must not be cached across traces).

        - ``last_aux_loss`` = ``E * sum_e(f_e * P_e)``: f_e the (no-grad)
          fraction of tokens whose argmax expert is e, P_e the mean router
          probability — the load-balancing loss of the Switch recipe
          (minimised at uniform routing, value 1.0).
        - ``last_z_loss`` = ``mean(logsumexp(logits)^2)`` (router z-loss,
          ST-MoE): keeps router logits small, stabilising bf16 training.
        - ``last_expert_fraction`` (const, (E,)): f_e for telemetry.
        """
        import jax.numpy as jnp

        from ...backend import BackendTensor
        from ...tensor import Tensor

        E = self.n_experts
        arr = logits.data.array
        flat = arr.reshape(-1, E)
        am = jnp.argmax(flat, -1)
        f = jnp.mean(
            (am[:, None] == jnp.arange(E)[None, :]).astype(jnp.float32), 0
        )  # (E,)
        f_t = Tensor(BackendTensor._wrap(f.astype(arr.dtype), logits.device))
        probs = F.softmax(logits, axis).reshape(-1, E)
        P = probs.mean(0)  # (E,) — tape; grads flow into the router
        self.last_aux_loss = (f_t * P).sum() * float(E)
        m = logits.max(axis, True)
        lse = tensor.log(tensor.exp(logits - m).sum(axis, True)) + m
        self.last_z_loss = (lse * lse).mean()
        self.last_expert_fraction = Tensor(
            BackendTensor._wrap(f, logits.device)
        )

    def _sparse_forward(self, x):
        import math

        import jax.numpy as jnp

        from ...backend import BackendTensor
        from ...tensor import Tensor

        logits = self.router(x)  # tape — aux/z grads flow into the router
        self._record_aux(logits, x.ndim - 1)
        if self._sparse_fn is None:
            import jax

            from ..jax_bridge import jax_function

            E = self.n_experts
            cf = self.capacity_factor
            act = self.activation

            def fn(xa, la, w1, b1, w2, b2):
                shape = xa.shape
                D = shape[-1]
                xf = xa.reshape(-1, D)
                N = xf.shape[0]
                C = max(1, int(math.ceil(N / E * cf)))
                gates = jax.nn.softmax(la.reshape(N, -1), -1)  # (N,E)
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
        # dropped-token fraction (no-grad telemetry): replay the capacity
        # bookkeeping at the array level; XLA dead-code-shares the cheap
        # O(N*E) elementwise part, the expert einsums stay inside the bridge
        arr = logits.data.array
        E = self.n_experts
        flat = arr.reshape(-1, E)
        N = flat.shape[0]
        C = max(1, int(math.ceil(N / E * self.capacity_factor)))
        am = jnp.argmax(flat, -1)
        onehot = (am[:, None] == jnp.arange(E)[None, :]).astype(jnp.float32)
        pos = (jnp.cumsum(onehot, 0) - 1.0) * onehot
        keep = jnp.where(pos < C, onehot, 0.0)
        self.last_dropped_fraction = Tensor(
            BackendTensor._wrap(1.0 - keep.sum() / N, logits.device)
        )
        return self._sparse_fn(
            x,
            logits,
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


class MoECriterion(Module):
    """Criterion wrapper that adds every MoE submodule's Switch auxiliary
    load-balancing loss (weight ``aux_weight``, Switch paper default 1e-2)
    and ST-MoE router z-loss (``z_weight``, paper default 1e-3) to the base
    task loss.

    The aux terms are recorded by each ``MoE.forward`` on the SAME tape the
    criterion runs on (``jit.CompiledTrainStep`` traces forward + criterion
    into one program), so gradients flow into the router.  Without the
    load-balancing term, top-1 routing collapses onto a few experts — the
    aux loss is the load-bearing ingredient of the Switch recipe
    (A/B-tested in tests/test_moe_training.py)."""

    def __init__(self, base, model: Module, aux_weight: float = 1e-2,
                 z_weight: float = 1e-3):
        super().__init__()
        self.base = base
        moes = [m for m in model.modules() if isinstance(m, MoE)]
        if not moes:
            raise ValueError("model has no MoE submodules")
        object.__setattr__(self, "_moes", moes)
        self.aux_weight = float(aux_weight)
        self.z_weight = float(z_weight)

    @property
    def reduction(self):
        # grad-accum microbatch combine keys off the base loss's reduction
        return getattr(self.base, "reduction", "mean")

    def forward(self, input, target):
        loss = self.base(input, target)
        for m in self._moes:
            if self.aux_weight and m.last_aux_loss is not None:
                loss = loss + m.last_aux_loss * self.aux_weight
            if self.z_weight and m.last_z_loss is not None:
                loss = loss + m.last_z_loss * self.z_weight
        return loss
