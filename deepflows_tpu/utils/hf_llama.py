"""HuggingFace Llama interop: build a ``models.LlamaLM`` from a
transformers Llama config and load its weights.

No reference analog (the reference's pretrained pipeline covers
torchvision CNNs, `utils/convert_pretrained.py`); this is the same
capability for the LM family — a user with a real Llama checkpoint
(``LlamaForCausalLM`` or its ``state_dict()`` from torch.load /
safetensors) ports it into the TPU-native model and gets the full stack
(compiled training, LoRA, KV-cache serving, FSDP) on those weights.

Verified by logit-equivalence against ``transformers``' own forward on
randomly initialized configs, incl. GQA and tied embeddings
(tests/test_hf_llama.py) — the RoPE convention (NeoX half-rotation,
duplicated-half cos/sin tables) matches HF exactly, so outputs agree to
float tolerance, not approximately.

Weight-layout notes: HF Linear weights are (out, in) and ours are the
reference's (in, out) — every projection transposes; ``lm_head`` falls
back to the tied token embedding when absent.
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor, no hard torch dependency
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def build_llama_from_hf_config(cfg, max_len: Optional[int] = None,
                               device=None):
    """``models.LlamaLM`` with the architecture of a transformers
    ``LlamaConfig`` (hidden size, heads, GQA width, intermediate size,
    rope theta, rms eps)."""
    from ..models.llama import LlamaLM

    if getattr(cfg, "attention_bias", False):
        raise NotImplementedError(
            "attention_bias=True Llama variants are not supported "
            "(this LlamaLM is bias-free per the Llama recipe)"
        )
    dim = cfg.hidden_size
    model = LlamaLM(
        vocab_size=cfg.vocab_size,
        max_len=int(max_len or cfg.max_position_embeddings),
        dim=dim,
        depth=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=getattr(cfg, "num_key_value_heads", None),
        mlp_ratio=cfg.intermediate_size / dim,
        rope_theta=float(getattr(cfg, "rope_theta", 10000.0)),
        device=device,
        # Mistral configs carry sliding_window (None on plain Llama)
        window=getattr(cfg, "sliding_window", None),
    )
    eps = float(getattr(cfg, "rms_norm_eps", 1e-6))
    for blk in model.blocks:
        blk.norm1.eps = eps
        blk.norm2.eps = eps
    model.norm.eps = eps
    return model


def load_hf_llama_state(model, state_dict: Mapping) -> None:
    """Load a transformers Llama ``state_dict`` into ``model`` (a
    ``models.LlamaLM`` with matching architecture) in place.  Accepts
    torch tensors or arrays; raises KeyError/ValueError on missing keys
    or shape mismatches (nothing is silently skipped)."""
    from ..backend import BackendTensor

    sd = {k: v for k, v in state_dict.items()}

    def put(param, key: str, transpose: bool = False):
        if key not in sd:
            raise KeyError(f"state_dict is missing {key!r}")
        arr = _np(sd.pop(key)).astype(np.float32)
        if transpose:
            arr = arr.T
        if tuple(arr.shape) != tuple(param.shape):
            raise ValueError(
                f"{key}: shape {arr.shape} does not fit {tuple(param.shape)}"
            )
        param.data = BackendTensor(np.ascontiguousarray(arr),
                                   device=param.device)

    put(model.tok_embed.weight, "model.embed_tokens.weight")
    for i, blk in enumerate(model.blocks):
        pre = f"model.layers.{i}."
        put(blk.norm1.weight, pre + "input_layernorm.weight")
        put(blk.attn.q_proj.weight, pre + "self_attn.q_proj.weight", True)
        put(blk.attn.k_proj.weight, pre + "self_attn.k_proj.weight", True)
        put(blk.attn.v_proj.weight, pre + "self_attn.v_proj.weight", True)
        put(blk.attn.out_proj.weight, pre + "self_attn.o_proj.weight", True)
        put(blk.norm2.weight, pre + "post_attention_layernorm.weight")
        put(blk.gate.weight, pre + "mlp.gate_proj.weight", True)
        put(blk.up.weight, pre + "mlp.up_proj.weight", True)
        put(blk.down.weight, pre + "mlp.down_proj.weight", True)
    put(model.norm.weight, "model.norm.weight")
    if "lm_head.weight" in sd:
        put(model.head.weight, "lm_head.weight", True)
    else:  # tied embeddings: the head shares the token table
        arr = np.ascontiguousarray(
            _np(state_dict["model.embed_tokens.weight"]).astype(np.float32).T
        )
        if tuple(arr.shape) != tuple(model.head.weight.shape):
            raise ValueError("tied lm_head shape mismatch")
        model.head.weight.data = BackendTensor(
            arr, device=model.head.weight.device
        )
    # anything left (rotary inv_freq buffers are absent from HF state
    # dicts; a leftover here means an unconverted weight)
    leftover = [k for k in sd if not k.endswith("inv_freq")]
    if leftover:
        raise ValueError(f"unconverted state_dict entries: {leftover}")


def convert_hf_llama(hf_model, max_len: Optional[int] = None, device=None):
    """One-call port: transformers ``LlamaForCausalLM`` -> ``LlamaLM``
    with its weights loaded."""
    model = build_llama_from_hf_config(
        hf_model.config, max_len=max_len, device=device
    )
    load_hf_llama_state(model, hf_model.state_dict())
    return model


# --------------------------------------------------------------- Mixtral
def build_mixtral_from_hf_config(cfg, max_len: Optional[int] = None,
                                 device=None):
    """``models.MixtralLM`` matching a transformers ``MixtralConfig``
    (expert count, top-k, GQA width, intermediate size, rope theta)."""
    from ..models.mixtral import MixtralLM

    dim = cfg.hidden_size
    model = MixtralLM(
        vocab_size=cfg.vocab_size,
        max_len=int(max_len or cfg.max_position_embeddings),
        dim=dim,
        depth=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=getattr(cfg, "num_key_value_heads", None),
        n_experts=cfg.num_local_experts,
        top_k=cfg.num_experts_per_tok,
        mlp_ratio=cfg.intermediate_size / dim,
        rope_theta=float(getattr(cfg, "rope_theta", 10000.0)),
        device=device,
    )
    eps = float(getattr(cfg, "rms_norm_eps", 1e-6))
    for blk in model.blocks:
        blk.norm1.eps = eps
        blk.norm2.eps = eps
    model.norm.eps = eps
    return model


def load_hf_mixtral_state(model, state_dict: Mapping) -> None:
    """Load a transformers Mixtral ``state_dict`` into ``model`` (a
    ``models.MixtralLM``).  Per-expert w1/w3/w2 (gate/up/down, (out, in))
    stack transposed into the (E, in, out) expert tensors; the router has
    no bias in HF, so ours is zeroed.  The top-2 routing math is
    equivalent by construction: softmax-then-top-k-renormalise equals
    HF's top-k-of-logits-then-softmax (softmax is order-preserving)."""
    from ..backend import BackendTensor

    sd = {k: v for k, v in state_dict.items()}

    def put(param, key: str, transpose: bool = False):
        if key not in sd:
            raise KeyError(f"state_dict is missing {key!r}")
        arr = _np(sd.pop(key)).astype(np.float32)
        if transpose:
            arr = arr.T
        if tuple(arr.shape) != tuple(param.shape):
            raise ValueError(
                f"{key}: shape {arr.shape} does not fit {tuple(param.shape)}"
            )
        param.data = BackendTensor(np.ascontiguousarray(arr),
                                   device=param.device)

    def put_stacked(param, keys):
        mats = []
        for key in keys:
            if key not in sd:
                raise KeyError(f"state_dict is missing {key!r}")
            mats.append(_np(sd.pop(key)).astype(np.float32).T)
        arr = np.ascontiguousarray(np.stack(mats))
        if tuple(arr.shape) != tuple(param.shape):
            raise ValueError(
                f"{keys[0]}...: stack {arr.shape} does not fit "
                f"{tuple(param.shape)}"
            )
        param.data = BackendTensor(arr, device=param.device)

    put(model.tok_embed.weight, "model.embed_tokens.weight")
    for i, blk in enumerate(model.blocks):
        pre = f"model.layers.{i}."
        put(blk.norm1.weight, pre + "input_layernorm.weight")
        put(blk.attn.q_proj.weight, pre + "self_attn.q_proj.weight", True)
        put(blk.attn.k_proj.weight, pre + "self_attn.k_proj.weight", True)
        put(blk.attn.v_proj.weight, pre + "self_attn.v_proj.weight", True)
        put(blk.attn.out_proj.weight, pre + "self_attn.o_proj.weight", True)
        put(blk.norm2.weight, pre + "post_attention_layernorm.weight")
        moe, E = blk.moe, blk.moe.n_experts
        put(moe.router.weight, pre + "block_sparse_moe.gate.weight", True)
        moe.router.bias.data = BackendTensor(
            np.zeros(tuple(moe.router.bias.shape), np.float32),
            device=moe.router.bias.device,
        )
        ex = pre + "block_sparse_moe.experts."
        put_stacked(moe.experts_gate, [f"{ex}{j}.w1.weight" for j in range(E)])
        put_stacked(moe.experts_up, [f"{ex}{j}.w3.weight" for j in range(E)])
        put_stacked(moe.experts_down, [f"{ex}{j}.w2.weight" for j in range(E)])
    put(model.norm.weight, "model.norm.weight")
    if "lm_head.weight" in sd:
        put(model.head.weight, "lm_head.weight", True)
    else:
        arr = np.ascontiguousarray(
            _np(state_dict["model.embed_tokens.weight"]).astype(np.float32).T
        )
        model.head.weight.data = BackendTensor(
            arr, device=model.head.weight.device
        )
    leftover = [k for k in sd if not k.endswith("inv_freq")]
    if leftover:
        raise ValueError(f"unconverted state_dict entries: {leftover}")


def convert_hf_mixtral(hf_model, max_len: Optional[int] = None,
                       device=None):
    """One-call port: transformers ``MixtralForCausalLM`` ->
    ``MixtralLM`` with its weights loaded."""
    model = build_mixtral_from_hf_config(
        hf_model.config, max_len=max_len, device=device
    )
    load_hf_mixtral_state(model, hf_model.state_dict())
    return model
