"""HuggingFace GPT-2 interop: build a ``models.TransformerLM`` from a
transformers ``GPT2Config`` and load its weights.

Completes the HF-interop trio next to `utils/hf_llama.py`
(Llama/Mistral/Mixtral): the learned-positional LayerNorm family.  GPT-2
stores its projections as Conv1D — already (in, out), so unlike the
Llama path NOTHING transposes except the tied ``lm_head``; ``c_attn``
splits column-wise into q/k/v.  GPT-2's activation is the tanh-
approximate GELU, so the converter swaps each block's exact-GELU module
for ``nn.GELU(approximate="tanh")`` — without this the logits drift at
the 1e-3 level instead of matching.

Verified by logit equivalence against transformers' forward on random
configs (tests/test_hf_llama.py)."""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def build_gpt2_from_hf_config(cfg, max_len: Optional[int] = None,
                              device=None):
    from .. import nn
    from ..models.transformer_lm import TransformerLM

    model = TransformerLM(
        vocab_size=cfg.vocab_size,
        max_len=int(max_len or cfg.n_positions),
        dim=cfg.n_embd,
        depth=cfg.n_layer,
        num_heads=cfg.n_head,
        mlp_ratio=(getattr(cfg, "n_inner", None) or 4 * cfg.n_embd)
        / cfg.n_embd,
        device=device,
    )
    eps = float(getattr(cfg, "layer_norm_epsilon", 1e-5))
    for blk in model.blocks:
        blk.mlp[1] = nn.GELU(approximate="tanh")  # gelt_new, not exact
        blk.norm1.eps = eps
        blk.norm2.eps = eps
    model.norm.eps = eps
    return model


def load_hf_gpt2_state(model, state_dict: Mapping) -> None:
    """Load a transformers GPT-2 ``state_dict`` into ``model`` (a
    ``models.TransformerLM``).  Conv1D weights are already (in, out);
    the fused ``c_attn`` splits into q/k/v; the tied head transposes the
    token table and zeroes our head bias (GPT-2's lm_head has none)."""
    from ..backend import BackendTensor

    sd = {k: v for k, v in state_dict.items()}

    def arr_of(key):
        if key not in sd:
            raise KeyError(f"state_dict is missing {key!r}")
        return _np(sd.pop(key)).astype(np.float32)

    def put(param, arr, key):
        arr = np.ascontiguousarray(arr.reshape(tuple(param.shape)))
        if arr.size != int(np.prod(param.shape)):
            raise ValueError(
                f"{key}: shape {arr.shape} does not fit {tuple(param.shape)}"
            )
        param.data = BackendTensor(arr, device=param.device)

    D = model.pos_embed.shape[2]
    put(model.tok_embed.weight, arr_of("transformer.wte.weight"),
        "transformer.wte.weight")
    wpe = arr_of("transformer.wpe.weight")
    if wpe.shape[0] < model.max_len:
        raise ValueError(
            f"wpe covers {wpe.shape[0]} positions < max_len {model.max_len}"
        )
    put(model.pos_embed, wpe[: model.max_len][None], "transformer.wpe.weight")
    for i, blk in enumerate(model.blocks):
        pre = f"transformer.h.{i}."
        put(blk.norm1.weight, arr_of(pre + "ln_1.weight"), pre + "ln_1.weight")
        put(blk.norm1.bias, arr_of(pre + "ln_1.bias"), pre + "ln_1.bias")
        ca_w = arr_of(pre + "attn.c_attn.weight")  # (D, 3D), Conv1D layout
        ca_b = arr_of(pre + "attn.c_attn.bias")  # (3D,)
        if ca_w.shape != (D, 3 * D):
            raise ValueError(f"{pre}attn.c_attn.weight: {ca_w.shape}")
        for j, (w_p, b_p) in enumerate(
            ((blk.attn.q_proj.weight, blk.attn.q_proj.bias),
             (blk.attn.k_proj.weight, blk.attn.k_proj.bias),
             (blk.attn.v_proj.weight, blk.attn.v_proj.bias))
        ):
            put(w_p, ca_w[:, j * D:(j + 1) * D], pre + "attn.c_attn.weight")
            put(b_p, ca_b[j * D:(j + 1) * D], pre + "attn.c_attn.bias")
        put(blk.attn.out_proj.weight, arr_of(pre + "attn.c_proj.weight"),
            pre + "attn.c_proj.weight")
        put(blk.attn.out_proj.bias, arr_of(pre + "attn.c_proj.bias"),
            pre + "attn.c_proj.bias")
        put(blk.norm2.weight, arr_of(pre + "ln_2.weight"), pre + "ln_2.weight")
        put(blk.norm2.bias, arr_of(pre + "ln_2.bias"), pre + "ln_2.bias")
        put(blk.mlp[0].weight, arr_of(pre + "mlp.c_fc.weight"),
            pre + "mlp.c_fc.weight")
        put(blk.mlp[0].bias, arr_of(pre + "mlp.c_fc.bias"),
            pre + "mlp.c_fc.bias")
        put(blk.mlp[2].weight, arr_of(pre + "mlp.c_proj.weight"),
            pre + "mlp.c_proj.weight")
        put(blk.mlp[2].bias, arr_of(pre + "mlp.c_proj.bias"),
            pre + "mlp.c_proj.bias")
    put(model.norm.weight, arr_of("transformer.ln_f.weight"),
        "transformer.ln_f.weight")
    put(model.norm.bias, arr_of("transformer.ln_f.bias"),
        "transformer.ln_f.bias")
    head = (
        arr_of("lm_head.weight")
        if "lm_head.weight" in sd
        else _np(state_dict["transformer.wte.weight"]).astype(np.float32)
    )
    put(model.head.weight, head.T, "lm_head.weight")
    model.head.bias.data = BackendTensor(
        np.zeros(tuple(model.head.bias.shape), np.float32),
        device=model.head.bias.device,
    )
    leftover = [k for k in sd if ".attn.bias" not in k
                and ".attn.masked_bias" not in k]
    if leftover:
        raise ValueError(f"unconverted state_dict entries: {leftover}")


def convert_hf_gpt2(hf_model, max_len: Optional[int] = None, device=None):
    """One-call port: transformers ``GPT2LMHeadModel`` ->
    ``TransformerLM`` with its weights loaded."""
    model = build_gpt2_from_hf_config(
        hf_model.config, max_len=max_len, device=device
    )
    load_hf_gpt2_state(model, hf_model.state_dict())
    return model
