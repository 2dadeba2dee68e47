"""Checkpoint save/load (reference: `DeepFlows/utils/model_utils.py`).

Checkpoint dict layout matches the reference
(`model_utils.py:37-74`): ``{epoch, loss, model_parameters: {name: ndarray},
optimizer_state: {type, lr, momentum, weight_decay, v, s, t}}`` — with one
documented fix: ``model_buffers`` is included so BatchNorm running stats
survive a save/load round-trip (the reference iterated only
``named_parameters`` and silently dropped them, SURVEY §5).

dill is preferred over pickle when available (`model_utils.py:10-16`).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import dill as pickle
except ImportError:  # pragma: no cover
    import pickle

from ..backend import BackendTensor
from ..nn.modules.module import Module
from ..optim.optimizer import Optimizer


def save_checkpoint(
    model: Module,
    optimizer: Optional[Optimizer] = None,
    epoch: int = 0,
    loss: Optional[float] = None,
    save_path: str = "checkpoint.pkl",
    extra: Optional[dict] = None,
) -> None:
    parent = os.path.dirname(os.path.abspath(save_path))
    os.makedirs(parent, exist_ok=True)

    checkpoint = {
        "epoch": epoch,
        "loss": loss,
        "model_parameters": {
            name: param.numpy() for name, param in model.named_parameters()
        },
        # fix vs reference: persist buffers (BN running stats)
        "model_buffers": {name: buf.numpy() for name, buf in model.named_buffers()},
    }
    if optimizer is not None:
        opt_state = {"type": type(optimizer).__name__}
        for attr in ("lr", "momentum", "weight_decay"):
            if hasattr(optimizer, attr):
                opt_state[attr] = getattr(optimizer, attr)
        optimizer._ensure_state()
        state = optimizer._state

        def _to_np(v):
            if v is None:
                return None
            if isinstance(v, list):
                return [_to_np(x) for x in v]
            return np.asarray(v)

        # reference-compatible Adam keys (v/s/t) plus the full generic state
        for key in ("v", "s"):
            if isinstance(state, dict) and key in state:
                opt_state[key] = _to_np(state[key])
        if isinstance(state, dict) and "t" in state:
            opt_state["t"] = int(state["t"]) + 1  # reference t starts at 1
        opt_state["full_state"] = (
            {k: _to_np(v) for k, v in state.items()} if isinstance(state, dict) else None
        )
        checkpoint["optimizer_state"] = opt_state
    if extra:
        checkpoint.update(extra)

    with open(save_path, "wb") as f:
        pickle.dump(checkpoint, f)


def load_checkpoint(
    model: Module,
    optimizer: Optional[Optimizer] = None,
    load_path: str = "checkpoint.pkl",
    strict: bool = True,
) -> dict:
    """Restore parameters (+buffers, + optimizer state) onto each tensor's
    current device; returns ``{'epoch': ..., 'loss': ...}`` like the
    reference (`model_utils.py:178-181`)."""
    with open(load_path, "rb") as f:
        checkpoint = pickle.load(f)

    params = dict(model.named_parameters())
    for name, arr in checkpoint.get("model_parameters", {}).items():
        if name not in params:
            if strict:
                raise KeyError(f"checkpoint parameter {name} not in model")
            continue
        p = params[name]
        p.data = BackendTensor(np.asarray(arr), device=p.device, dtype=p.dtype)
    buffers = dict(model.named_buffers())
    for name, arr in checkpoint.get("model_buffers", {}).items():
        if name not in buffers:
            if strict:
                raise KeyError(f"checkpoint buffer {name} not in model")
            continue
        b = buffers[name]
        b.data = BackendTensor(np.asarray(arr), device=b.device, dtype=b.dtype)

    opt_state = checkpoint.get("optimizer_state")
    if optimizer is not None and opt_state is not None:
        for attr in ("lr", "momentum", "weight_decay"):
            if attr in opt_state and hasattr(optimizer, attr):
                setattr(optimizer, attr, opt_state[attr])
        full = opt_state.get("full_state")
        if full is None and "v" in opt_state and "s" in opt_state:
            # REFERENCE-layout checkpoint (no full_state): Adam v/s as lists
            # ordered like optimizer.params, t starting at 1
            # (`/root/reference/DeepFlows/utils/model_utils.py:140-173`; the
            # committed artifacts under `/root/reference/test/checkpoints-*`
            # have exactly this shape)
            vs, ss = opt_state["v"], opt_state["s"]
            if strict and (
                len(vs) != len(optimizer.params) or len(ss) != len(optimizer.params)
            ):
                raise ValueError(
                    f"checkpoint Adam state holds {len(vs)} slots for "
                    f"{len(optimizer.params)} optimizer params"
                )

            def _slot(x, p):
                arr = np.asarray(x, dtype=np.float32)
                if strict and tuple(arr.shape) != tuple(p.shape):
                    raise ValueError(
                        f"Adam state shape {arr.shape} != param shape {p.shape}"
                    )
                return p.device.device_put(arr)

            optimizer._state = {
                "v": [_slot(x, p) for x, p in zip(vs, optimizer.params)],
                "s": [_slot(x, p) for x, p in zip(ss, optimizer.params)],
                # our t is 0-based pre-increment; reference persists t
                # starting at 1 (`model_utils.py:70`)
                "t": np.asarray(int(opt_state.get("t", 1)) - 1, dtype=np.int32),
            }
        elif full is not None:
            def _to_dev(v, slots):
                if v is None:
                    return None
                if isinstance(v, list):
                    return [
                        None
                        if x is None
                        else p.device.device_put(np.asarray(x, dtype=np.float32))
                        for x, p in zip(v, slots)
                    ]
                return np.asarray(v)

            restored = {}
            for k, v in full.items():
                restored[k] = _to_dev(v, optimizer.params)
            optimizer._state = restored

    return {"epoch": checkpoint.get("epoch", 0), "loss": checkpoint.get("loss")}
