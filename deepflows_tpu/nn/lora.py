"""LoRA — low-rank adaptation for parameter-efficient fine-tuning
(Hu et al. 2021).

No reference analog; shipped because fine-tuning pretrained transformers
is the dominant adaptation workflow and LoRA is its standard form.  A
:class:`LoRALinear` wraps a frozen base ``nn.Linear`` with a rank-``r``
update ``x @ A @ B * (alpha / r)`` (A kaiming-init, B ZERO-init — the
wrap is an exact identity at step 0); :func:`apply_lora` swaps matching
Linears in place across a model, freezes everything else, and returns
the trainable adapter parameters.

TPU angle: adapters add two skinny matmuls per layer (MXU-friendly, no
gather/scatter), and the frozen base weights produce no grads or
optimizer state — together with Adafactor this makes fine-tuning HBM
cost ~2·r·(d_in+d_out) per adapted layer instead of 3·d_in·d_out.

``merge_lora``/``unmerge_lora`` fold the update into the base weight for
zero-overhead deployment (the ONNX exporter and serving paths then see a
plain Linear graph); :func:`lora_state_dict` checkpoints adapters only.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Optional

import numpy as np

from .. import tensor
from . import init
from .modules.dropout import Dropout
from .modules.linear import Linear
from .modules.module import Module
from .parameter import Parameter


class LoRALinear(Module):
    """``base(x) + dropout(x) @ A @ B * (alpha/r)`` with ``base`` frozen.

    ``base`` keeps the reference (in, out) weight convention; A is
    (in, r), B is (r, out) zero-init so the adapted module is exactly the
    base at initialisation."""

    def __init__(self, base: Linear, r: int = 8, alpha: float = 16.0,
                 dropout: float = 0.0):
        super().__init__()
        if r < 1:
            raise ValueError("LoRA rank must be >= 1")
        self.base = base
        self.r = int(r)
        self.alpha = float(alpha)
        self.scaling = self.alpha / self.r
        dev = base.device
        self.lora_A = Parameter(
            tensor.empty((base.in_features, r), device=dev)
        )
        self.lora_B = Parameter(
            tensor.zeros((r, base.out_features), device=dev)
        )
        init.kaiming_uniform_(self.lora_A, a=math.sqrt(5))
        self.lora_dropout = Dropout(dropout) if dropout > 0 else None
        self.merged = False
        self.base.requires_grad_(False)

    @property
    def in_features(self):
        return self.base.in_features

    @property
    def out_features(self):
        return self.base.out_features

    # read-only views for code that inspects layer weights (e.g. the
    # MHA device check, TP sharding rules); compute always goes through
    # ``base.__call__`` so the adapter is never silently skipped
    @property
    def weight(self):
        return self.base.weight

    @property
    def bias(self):
        return self.base.bias

    def forward(self, input):
        out = self.base(input)
        if self.merged:
            return out
        h = input
        if self.lora_dropout is not None:
            h = self.lora_dropout(h)
        return out + (h @ self.lora_A) @ self.lora_B * self.scaling

    # ------------------------------------------------------------- merging
    def _delta(self):
        a = self.lora_A.data.array
        b = self.lora_B.data.array
        return (a @ b) * self.scaling

    def merge(self) -> None:
        """Fold A@B into the base weight (deployment mode: adapter matmuls
        disappear; forward == adapted forward exactly)."""
        if self.merged:
            return
        from ..backend import BackendTensor

        w = self.base.weight.data.array
        self.base.weight.data = BackendTensor._wrap(
            (w + self._delta().astype(w.dtype)), self.base.device
        )
        self.merged = True

    def unmerge(self) -> None:
        if not self.merged:
            return
        from ..backend import BackendTensor

        w = self.base.weight.data.array
        self.base.weight.data = BackendTensor._wrap(
            (w - self._delta().astype(w.dtype)), self.base.device
        )
        self.merged = False

    def extra_repr(self) -> str:
        return (
            f"in_features={self.base.in_features}, "
            f"out_features={self.base.out_features}, r={self.r}, "
            f"alpha={self.alpha}, merged={self.merged}"
        )


def _set_submodule(root: Module, path: str, new: Module) -> None:
    parts = path.split(".")
    parent = root
    for p in parts[:-1]:
        parent = getattr(parent, p)
    name = parts[-1]
    if name.isdigit() and hasattr(parent, "__setitem__"):
        parent[int(name)] = new
    else:
        setattr(parent, name, new)


def apply_lora(
    model: Module,
    r: int = 8,
    alpha: float = 16.0,
    dropout: float = 0.0,
    target: Optional[Iterable[str]] = None,
    freeze_rest: bool = True,
) -> List[Parameter]:
    """Replace Linear submodules with :class:`LoRALinear` in place.

    ``target``: substrings of qualified module names to adapt (e.g.
    ``["q_proj", "v_proj"]``); ``None`` adapts every Linear.  With
    ``freeze_rest`` (default) every non-adapter parameter is frozen, so
    ``[p for p in model.parameters() if p.requires_grad]`` — also the
    return value — is exactly the adapter set."""
    targets = list(target) if target is not None else None
    to_swap = []
    for name, mod in model.named_modules():
        if isinstance(mod, Linear) and not isinstance(mod, LoRALinear):
            if targets is None or any(t in name for t in targets):
                if name == "":
                    raise ValueError("cannot adapt the root module in place")
                to_swap.append((name, mod))
    if not to_swap:
        raise ValueError(
            f"no Linear submodule matched target={targets!r}"
        )
    if freeze_rest:
        model.requires_grad_(False)
    adapters: List[Parameter] = []
    for name, mod in to_swap:
        wrapped = LoRALinear(mod, r=r, alpha=alpha, dropout=dropout)
        _set_submodule(model, name, wrapped)
        adapters += [wrapped.lora_A, wrapped.lora_B]
    for p in adapters:
        p.requires_grad = True
    return adapters


def lora_state_dict(model: Module) -> Dict[str, np.ndarray]:
    """Adapter-only checkpoint (orders of magnitude smaller than the
    full model)."""
    out = {}
    for name, mod in model.named_modules():
        if isinstance(mod, LoRALinear):
            out[f"{name}.lora_A"] = np.asarray(mod.lora_A.data.array)
            out[f"{name}.lora_B"] = np.asarray(mod.lora_B.data.array)
    return out


def load_lora_state_dict(model: Module, sd: Dict[str, np.ndarray]) -> None:
    from ..backend import BackendTensor

    found = set()
    for name, mod in model.named_modules():
        if isinstance(mod, LoRALinear):
            for slot in ("lora_A", "lora_B"):
                key = f"{name}.{slot}"
                if key not in sd:
                    raise KeyError(f"missing adapter entry {key!r}")
                p = getattr(mod, slot)
                arr = np.asarray(sd[key])
                if tuple(arr.shape) != tuple(p.shape):
                    raise ValueError(
                        f"{key}: shape {arr.shape} != {tuple(p.shape)}"
                    )
                # preserve the parameter's dtype (bf16 adapters must stay
                # bf16 — an unconditional f32 cast would silently promote
                # the adapter matmuls and downstream activations)
                p.data = BackendTensor(
                    arr, device=p.device, dtype=p.data.dtype
                )
                found.add(key)
    extra = set(sd) - found
    if extra:
        raise KeyError(f"unmatched adapter entries: {sorted(extra)}")


def assert_no_unmerged_lora(model: Module, context: str) -> None:
    """Guard for weight-gathering fast paths (KV-cache decoders gather
    ``q_proj.weight`` etc. directly): an UNMERGED adapter would be
    silently dropped from generation.  Raise with the fix instead."""
    for name, mod in model.named_modules():
        if isinstance(mod, LoRALinear) and not mod.merged:
            raise RuntimeError(
                f"{context} gathers base weights directly and would skip "
                f"the unmerged LoRA adapter at {name!r} — call "
                "nn.merge_lora(model) first (nn.unmerge_lora restores "
                "the trainable form)"
            )


def merge_lora(model: Module) -> Module:
    for mod in model.modules():
        if isinstance(mod, LoRALinear):
            mod.merge()
    return model


def unmerge_lora(model: Module) -> Module:
    for mod in model.modules():
        if isinstance(mod, LoRALinear):
            mod.unmerge()
    return model
