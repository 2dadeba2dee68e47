"""Llama family (models/llama.py): SiLU/RMSNorm/RoPE/GQA torch
differentials, full-model forward+grad parity against a hand-built torch
twin, compiled training, and KV-cache decoding (the GQA cache is
num_kv_heads wide)."""

import numpy as np
import pytest
import torch

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.models.decoding import KVCacheDecoder

RNG = np.random.default_rng(7)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_silu_matches_torch():
    x = RNG.standard_normal((3, 5, 8)).astype(np.float32) * 3
    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out = nn.SiLU()(xt)
    (out * out).sum().backward()

    tx = torch.tensor(x, requires_grad=True)
    tout = torch.nn.functional.silu(tx)
    (tout * tout).sum().backward()
    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_rmsnorm_matches_torch():
    df.manual_seed(0)
    rn = nn.RMSNorm(16, device="tpu")
    trn = torch.nn.RMSNorm(16, eps=rn.eps)
    with torch.no_grad():
        trn.weight.copy_(torch.tensor(rn.weight.numpy()) + 0.1)
    rn.weight.data[...] = trn.weight.detach().numpy()
    x = RNG.standard_normal((4, 7, 16)).astype(np.float32)

    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out = rn(xt)
    (out * out).sum().backward()

    tx = torch.tensor(x, requires_grad=True)
    tout = trn(tx)
    (tout * tout).sum().backward()
    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        rn.weight.grad.numpy(), trn.weight.grad.numpy(), rtol=1e-4, atol=1e-4
    )


def _rope_torch(x, theta=10000.0):
    """NeoX/Llama half-rotation RoPE on (B, H, L, D) torch tensors."""
    B, H, L, D = x.shape
    half = D // 2
    inv = 1.0 / (theta ** (torch.arange(0, half, dtype=torch.float64) * 2.0 / D))
    ang = torch.outer(torch.arange(L, dtype=torch.float64), inv)
    cos = torch.cat([ang.cos(), ang.cos()], -1).float()  # (L, D)
    sin = torch.cat([ang.sin(), ang.sin()], -1).float()
    rot = torch.cat([-x[..., half:], x[..., :half]], -1)
    return x * cos + rot * sin


def _gqa_attn_torch(mha, x):
    """Hand-built torch twin of MultiheadAttention(num_kv_heads, rope=True,
    causal=True, bias=False) on a (B, L, E) torch tensor."""
    B, L, E = x.shape
    H, Hkv, D = mha.num_heads, mha.num_kv_heads, mha.head_dim
    qw = torch.tensor(mha.q_proj.weight.numpy())  # (in, out) convention
    kw = torch.tensor(mha.k_proj.weight.numpy())
    vw = torch.tensor(mha.v_proj.weight.numpy())
    ow = torch.tensor(mha.out_proj.weight.numpy())
    q = (x @ qw).reshape(B, L, H, D).transpose(1, 2)
    k = (x @ kw).reshape(B, L, Hkv, D).transpose(1, 2)
    v = (x @ vw).reshape(B, L, Hkv, D).transpose(1, 2)
    q = _rope_torch(q, mha.rope_theta)
    k = _rope_torch(k, mha.rope_theta)
    k = k.repeat_interleave(H // Hkv, dim=1)
    v = v.repeat_interleave(H // Hkv, dim=1)
    s = (q @ k.transpose(-1, -2)) / (D ** 0.5)
    s = s + torch.triu(torch.full((L, L), -1e9), diagonal=1)
    a = torch.softmax(s, -1)
    out = (a @ v).transpose(1, 2).reshape(B, L, E)
    return out @ ow


def test_gqa_rope_attention_matches_torch():
    E, H, Hkv, B, L = 32, 4, 2, 2, 6
    df.manual_seed(1)
    mha = nn.MultiheadAttention(
        E, H, bias=False, causal=True, device="tpu", flash=False,
        num_kv_heads=Hkv, rope=True,
    )
    x = RNG.standard_normal((B, L, E)).astype(np.float32)

    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out = mha(xt)
    (out * out).sum().backward()

    tx = torch.tensor(x, requires_grad=True)
    tout = _gqa_attn_torch(mha, tx)
    (tout * tout).sum().backward()

    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-3, atol=1e-4)
    # KV projection shapes are grouped (the GQA point): (E, Hkv*D)
    assert mha.k_proj.weight.shape == (E, Hkv * (E // H))


def test_gqa_equals_full_heads_when_groups_of_one():
    """num_kv_heads == num_heads must route through the standard path and
    match a separately-seeded GQA path run with groups of one."""
    E, H, B, L = 16, 4, 2, 5
    df.manual_seed(3)
    a = nn.MultiheadAttention(E, H, bias=False, causal=True, device="tpu",
                              flash=False, rope=True)
    df.manual_seed(3)
    b = nn.MultiheadAttention(E, H, bias=False, causal=True, device="tpu",
                              flash=False, num_kv_heads=H, rope=True)
    x = RNG.standard_normal((B, L, E)).astype(np.float32)
    ya = a(Tensor(x.copy(), device="tpu"))
    yb = b(Tensor(x.copy(), device="tpu"))
    np.testing.assert_allclose(ya.numpy(), yb.numpy(), rtol=1e-6, atol=1e-7)


class _TorchLlama(torch.nn.Module):
    """Torch twin of LlamaLM, weights copied from the framework model."""

    def __init__(self, lm):
        super().__init__()
        self.lm = lm
        self.tok = torch.nn.Parameter(torch.tensor(lm.tok_embed.weight.numpy()))
        self.blocks = []
        for blk in lm.blocks:
            self.blocks.append(
                {
                    "n1": torch.nn.Parameter(torch.tensor(blk.norm1.weight.numpy())),
                    "n2": torch.nn.Parameter(torch.tensor(blk.norm2.weight.numpy())),
                    "gate": torch.nn.Parameter(torch.tensor(blk.gate.weight.numpy())),
                    "up": torch.nn.Parameter(torch.tensor(blk.up.weight.numpy())),
                    "down": torch.nn.Parameter(torch.tensor(blk.down.weight.numpy())),
                }
            )
        self.nf = torch.nn.Parameter(torch.tensor(lm.norm.weight.numpy()))
        self.head = torch.nn.Parameter(torch.tensor(lm.head.weight.numpy()))

    @staticmethod
    def _rms(x, w, eps=1e-6):
        return x * torch.rsqrt((x * x).mean(-1, keepdim=True) + eps) * w

    def forward(self, idx):
        x = self.tok[idx]
        for blk, p in zip(self.lm.blocks, self.blocks):
            h = self._rms(x, p["n1"], blk.norm1.eps)
            x = x + _gqa_attn_torch(blk.attn, h)
            h = self._rms(x, p["n2"], blk.norm2.eps)
            x = x + torch.nn.functional.silu(h @ p["gate"]) * (h @ p["up"]) @ p["down"]
        x = self._rms(x, self.nf, self.lm.norm.eps)
        return x @ self.head


def test_llama_lm_matches_torch():
    df.manual_seed(5)
    lm = models.LlamaLM(vocab_size=40, max_len=12, dim=32, depth=2,
                        num_heads=4, num_kv_heads=2, device="tpu", flash=False)
    twin = _TorchLlama(lm)
    idx = RNG.integers(0, 40, (2, 12))

    logits = lm(Tensor(idx, device="tpu"))
    tgt = RNG.integers(0, 40, (2, 12))
    loss = nn.CrossEntropyLoss()(
        logits.reshape(24, 40), Tensor(tgt.reshape(24), device="tpu")
    )
    loss.backward()

    tlogits = twin(torch.tensor(idx))
    tloss = torch.nn.functional.cross_entropy(
        tlogits.reshape(24, 40), torch.tensor(tgt.reshape(24))
    )
    tloss.backward()

    np.testing.assert_allclose(
        logits.numpy(), tlogits.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(loss.numpy()), float(tloss.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        lm.tok_embed.weight.grad.numpy(), twin.tok.grad.numpy(),
        rtol=1e-3, atol=1e-6,
    )
    blk = lm.blocks[0]
    tb = twin.blocks[0]
    np.testing.assert_allclose(
        blk.gate.weight.grad.numpy(), tb["gate"].grad.numpy(),
        rtol=1e-3, atol=1e-6,
    )
    np.testing.assert_allclose(
        blk.norm1.weight.grad.numpy(), tb["n1"].grad.numpy(),
        rtol=1e-3, atol=1e-6,
    )


def test_llama_trains_compiled():
    df.manual_seed(0)
    lm = models.LlamaLM(vocab_size=24, max_len=8, dim=32, depth=2,
                        num_heads=4, num_kv_heads=2, device="tpu", flash=False)
    opt = optim.Adam(lm.parameters(), lr=1e-2)
    # CrossEntropyLoss handles (B, L, V) sequence logits natively
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())
    # learn a fixed random next-token mapping
    seq = RNG.integers(0, 24, (8, 9)).astype(np.int32)
    x, y = seq[:, :8], seq[:, 1:]
    losses = [float(step(x, y)) for _ in range(60)]
    assert losses[-1] < 0.1 * losses[0], losses[::10]
    assert step._jitted._cache_size() == 1


def _lm(seed=5, **kw):
    df.manual_seed(seed)
    cfg = dict(vocab_size=48, max_len=24, dim=32, depth=2, num_heads=4,
               num_kv_heads=2, device="tpu", flash=False)
    cfg.update(kw)
    return models.LlamaLM(**cfg)


def test_llama_kv_decode_matches_generate():
    lm = _lm()
    dec = KVCacheDecoder(lm)
    idx = RNG.integers(0, 48, (3, 6)).astype(np.int64)
    want = lm.generate(idx.copy(), 10)
    got = dec.generate(idx.copy(), 10)
    np.testing.assert_array_equal(got, want)
    # GQA cache is num_kv_heads wide — the serving memory win
    import jax.numpy as jnp

    p = dec._prep_jit(dec._gather())
    prompt = np.zeros((3, lm.max_len), np.int32)
    prompt[:, :6] = idx
    kc, _, _ = dec._prefill_jit(p, jnp.asarray(prompt), 6)
    assert kc.shape == (2, 3, 2, lm.max_len, 8)  # (layers, B, Hkv, L, Dh)


def test_llama_kv_decode_bf16_and_int8():
    import jax.numpy as jnp

    # seed chosen for well-separated logits (ties under bf16/int8 rounding
    # would legitimately flip argmax on a random-init model); local rng so
    # the prompt doesn't depend on test order
    lm = _lm(seed=0)
    idx = np.random.default_rng(7).integers(0, 48, (2, 6)).astype(np.int64)
    want = KVCacheDecoder(lm).generate(idx.copy(), 8)
    for kw in ({"compute_dtype": jnp.bfloat16}, {"quant": "int8"},
               {"compute_dtype": jnp.bfloat16, "quant": "int8"}):
        got = KVCacheDecoder(lm, **kw).generate(idx.copy(), 8)
        np.testing.assert_array_equal(got, want)


def test_llama_kv_decode_sampling_and_beam():
    # seed/prompt pinned for well-separated logits (beam=1 and greedy run
    # DIFFERENT compiled programs; near-ties may round apart legitimately)
    lm = _lm(seed=3)
    dec = KVCacheDecoder(lm)
    idx = np.random.default_rng(3).integers(0, 48, (2, 5)).astype(np.int64)
    s1 = dec.generate(idx.copy(), 8, temperature=0.8, top_k=10, seed=4)
    s2 = dec.generate(idx.copy(), 8, temperature=0.8, top_k=10, seed=4)
    np.testing.assert_array_equal(s1, s2)
    greedy = dec.generate(idx.copy(), 6)
    b1 = dec.generate_beam(idx.copy(), 6, num_beams=1)
    np.testing.assert_array_equal(b1, greedy)
    seqs, scores = dec.generate_beam(idx.copy(), 6, num_beams=3, return_all=True)
    assert seqs.shape == (2, 3, 11) and scores.shape == (2, 3)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # best-first
