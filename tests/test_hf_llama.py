"""HuggingFace Llama interop (utils/hf_llama.py): a transformers
LlamaForCausalLM ports into models.LlamaLM with logit equivalence — the
proof that real Llama checkpoints (torch.load / safetensors state dicts)
work on the TPU-native stack."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor
from deepflows_tpu.utils.hf_llama import (
    build_llama_from_hf_config,
    convert_hf_llama,
    load_hf_llama_state,
)

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402  (cpu build, baked into the image)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _hf(vocab=64, dim=32, layers=2, heads=4, kv_heads=2, inter=86,
        tie=False, theta=10000.0):
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=dim, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=16,
        rope_theta=theta, attention_bias=False, tie_word_embeddings=tie,
    )
    return transformers.LlamaForCausalLM(cfg).eval()


def _logits_match(hf_model, ours, atol=3e-4):
    ids = np.random.default_rng(0).integers(
        0, hf_model.config.vocab_size, (2, 10)
    )
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    ours.eval()
    from deepflows_tpu.autograd import no_grad

    with no_grad():
        got = np.asarray(ours(Tensor(ids, device="tpu")).data.array)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)


def test_hf_llama_gqa_logits_match():
    """GQA config (4 heads / 2 kv-heads): converted logits equal
    transformers' to float tolerance — RoPE convention, GQA grouping and
    SwiGLU all line up exactly."""
    hf = _hf()
    ours = convert_hf_llama(hf, device="tpu")
    _logits_match(hf, ours)


def test_hf_llama_tied_embeddings():
    hf = _hf(tie=True, heads=2, kv_heads=2, dim=32, inter=64)
    ours = convert_hf_llama(hf, device="tpu")
    _logits_match(hf, ours)


def test_hf_llama_nondefault_theta_and_mha():
    hf = _hf(heads=4, kv_heads=4, theta=500000.0)
    ours = convert_hf_llama(hf, device="tpu")
    _logits_match(hf, ours)


def test_hf_llama_state_dict_roundtrip_via_torch_save(tmp_path):
    """The real-world path: a torch-saved state_dict file loads into a
    freshly built LlamaLM."""
    hf = _hf()
    p = tmp_path / "llama.pt"
    torch.save(hf.state_dict(), p)
    ours = build_llama_from_hf_config(hf.config, device="tpu")
    load_hf_llama_state(ours, torch.load(p))
    _logits_match(hf, ours)


def test_hf_llama_errors():
    hf = _hf()
    ours = build_llama_from_hf_config(hf.config, device="tpu")
    sd = hf.state_dict()
    bad = dict(sd)
    bad.pop("model.norm.weight")
    with pytest.raises(KeyError, match="model.norm.weight"):
        load_hf_llama_state(ours, bad)
    bad = dict(sd)
    bad["model.embed_tokens.weight"] = torch.zeros(8, 8)
    with pytest.raises(ValueError, match="does not fit"):
        load_hf_llama_state(ours, bad)
    cfg = transformers.LlamaConfig(attention_bias=True)
    with pytest.raises(NotImplementedError):
        build_llama_from_hf_config(cfg)


def test_hf_llama_converted_model_serves():
    """Converted weights drive the KV-cache decoder (greedy decode equals
    the tape forward's argmax chain — the serving path works on ported
    checkpoints)."""
    from deepflows_tpu import models

    hf = _hf()
    ours = convert_hf_llama(hf, device="tpu")
    dec = models.KVCacheDecoder(ours)
    ids = np.random.default_rng(1).integers(0, 64, (2, 4)).astype(np.int64)
    out = dec.generate(ids, 5)
    want = ours.generate(ids, 5)
    np.testing.assert_array_equal(out, want)


def _hf_mixtral(vocab=64, dim=32, layers=2, heads=4, kv=2, inter=64,
                experts=4, topk=2):
    torch.manual_seed(1)
    cfg = transformers.MixtralConfig(
        vocab_size=vocab, hidden_size=dim, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, max_position_embeddings=16,
        num_local_experts=experts, num_experts_per_tok=topk,
        tie_word_embeddings=False,
    )
    return transformers.MixtralForCausalLM(cfg).eval()


def test_hf_mixtral_logits_match():
    """Mixtral port: stacked-expert SwiGLU + top-2 routing reproduce
    transformers' logits (softmax-then-topk-renorm == HF's
    topk-then-softmax by order preservation)."""
    from deepflows_tpu.utils.hf_llama import convert_hf_mixtral

    hf = _hf_mixtral()
    ours = convert_hf_mixtral(hf, device="tpu")
    _logits_match(hf, ours, atol=5e-4)


def test_hf_mixtral_missing_expert_errors():
    from deepflows_tpu.utils.hf_llama import (
        build_mixtral_from_hf_config,
        load_hf_mixtral_state,
    )

    hf = _hf_mixtral(layers=1)
    ours = build_mixtral_from_hf_config(hf.config, device="tpu")
    sd = dict(hf.state_dict())
    sd.pop("model.layers.0.block_sparse_moe.experts.2.w1.weight")
    with pytest.raises(KeyError, match="experts.2.w1"):
        load_hf_mixtral_state(ours, sd)


def test_hf_mistral_sliding_window_logits_match():
    """MistralForCausalLM ports through the Llama converter (same weight
    names) with sliding_window threaded into the band-masked attention;
    seq > window so the band actually bites, and logits still match."""
    torch.manual_seed(2)
    cfg = transformers.MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=16, sliding_window=4,
        tie_word_embeddings=False,
    )
    hf = transformers.MistralForCausalLM(cfg).eval()
    hf._attn_implementation = "eager"  # sdpa may ignore sliding_window
    ours = convert_hf_llama(hf, device="tpu")
    assert ours.blocks[0].attn.window == 4
    _logits_match(hf, ours, atol=5e-4)


def test_hf_gpt2_logits_match():
    """GPT-2 ports into TransformerLM: Conv1D (in,out) weights load
    untransposed, fused c_attn splits into q/k/v, the tied head
    transposes the token table, and the converter swaps in tanh-GELU
    (gelu_new) — logits match transformers' forward."""
    from deepflows_tpu.utils.hf_gpt2 import convert_hf_gpt2

    torch.manual_seed(3)
    cfg = transformers.GPT2Config(
        vocab_size=64, n_positions=16, n_embd=32, n_layer=2, n_head=4,
    )
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    ours = convert_hf_gpt2(hf, device="tpu")
    _logits_match(hf, ours, atol=5e-4)


def test_hf_gpt2_decode_and_errors():
    from deepflows_tpu import models
    from deepflows_tpu.utils.hf_gpt2 import (
        build_gpt2_from_hf_config,
        convert_hf_gpt2,
        load_hf_gpt2_state,
    )

    torch.manual_seed(4)
    cfg = transformers.GPT2Config(
        vocab_size=64, n_positions=16, n_embd=32, n_layer=1, n_head=2,
    )
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    ours = convert_hf_gpt2(hf, device="tpu")
    ids = np.random.default_rng(2).integers(0, 64, (2, 4)).astype(np.int64)
    out = models.KVCacheDecoder(ours).generate(ids, 5)
    want = ours.generate(ids, 5)
    np.testing.assert_array_equal(out, want)

    sd = dict(hf.state_dict())
    sd.pop("transformer.ln_f.bias")
    fresh = build_gpt2_from_hf_config(hf.config, device="tpu")
    with pytest.raises(KeyError, match="ln_f.bias"):
        load_hf_gpt2_state(fresh, sd)
