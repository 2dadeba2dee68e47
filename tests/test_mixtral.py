"""Mixtral-style sparse-MoE LM: SwiGLU experts with top-2 routing on the
Llama attention recipe (arXiv:2401.04088).

No reference analog (the reference zoo is CNN-only) — this extends the
modern-LM coverage the way `models.llama` did.  Torch twins verify the
SwiGLU-expert MoE numerics + grads; the KV-cache decoder is greedy-output
equivalence-tested against the padded full-forward oracle.
"""

import numpy as np
import pytest
import torch

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.models import KVCacheDecoder

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _torch_moe_swiglu(moe, xt):
    """Torch twin of MoE(swiglu=True) forward: softmax router (top-k masked
    + renormalised when top_k>0), dense all-expert SwiGLU, gated combine."""
    rw = torch.tensor(moe.router.weight.numpy(), requires_grad=True)
    rb = torch.tensor(moe.router.bias.numpy(), requires_grad=True)
    wg = torch.tensor(moe.experts_gate.numpy(), requires_grad=True)
    wu = torch.tensor(moe.experts_up.numpy(), requires_grad=True)
    wd = torch.tensor(moe.experts_down.numpy(), requires_grad=True)
    gates = torch.softmax(xt @ rw + rb, -1)  # (N, E)
    if moe.top_k and moe.top_k < moe.n_experts:
        kth = torch.topk(gates, moe.top_k, -1).values[..., -1:]
        kept = torch.where(gates >= kth, gates, torch.zeros(()))
        gates = kept / kept.sum(-1, keepdim=True)
    g = torch.nn.functional.silu(torch.einsum("nd,edh->enh", xt, wg))
    u = torch.einsum("nd,edh->enh", xt, wu)
    oe = torch.einsum("enh,ehd->end", g * u, wd)
    out = torch.einsum("ne,end->nd", gates, oe)
    return out, dict(router_w=rw, gate=wg, up=wu, down=wd)


@pytest.mark.parametrize("top_k", [0, 2])
def test_moe_swiglu_matches_torch(top_k):
    df.manual_seed(3)
    moe = nn.MoE(16, 24, n_experts=4, top_k=top_k, swiglu=True, device="tpu")
    x = RNG.standard_normal((12, 16)).astype(np.float32)
    xt = torch.tensor(x, requires_grad=False)

    out = moe(Tensor(x, device="tpu"))
    loss = (out * out).mean()
    loss.backward()

    want, tp = _torch_moe_swiglu(moe, xt)
    tloss = (want * want).mean()
    tloss.backward()

    np.testing.assert_allclose(out.numpy(), want.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(moe.experts_gate.grad.numpy(),
                               tp["gate"].grad.numpy(), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(moe.experts_down.grad.numpy(),
                               tp["down"].grad.numpy(), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(moe.router.weight.grad.numpy(),
                               tp["router_w"].grad.numpy(), rtol=1e-3,
                               atol=1e-6)


def test_moe_swiglu_records_aux_losses():
    # MoECriterion reads last_aux_loss/last_z_loss — the swiglu expert body
    # must not skip the recording path
    df.manual_seed(0)
    moe = nn.MoE(8, 16, n_experts=4, top_k=2, swiglu=True, device="tpu")
    x = RNG.standard_normal((4, 6, 8)).astype(np.float32)
    moe(Tensor(x, device="tpu"))
    assert moe.last_aux_loss is not None and moe.last_z_loss is not None
    assert float(moe.last_aux_loss.numpy()) > 0.9  # >= 1 at uniform
    assert moe.last_dropped_fraction is None  # dense compute drops nothing


def test_moe_swiglu_rejects_capacity_factor():
    with pytest.raises(ValueError, match="dense/top-k"):
        nn.MoE(8, 16, n_experts=4, capacity_factor=1.0, swiglu=True)


def _mixtral(seed=5, **kw):
    df.manual_seed(seed)
    cfg = dict(vocab_size=48, max_len=24, dim=32, depth=2, num_heads=4,
               num_kv_heads=2, n_experts=4, top_k=2, device="tpu",
               flash=False)
    cfg.update(kw)
    return models.MixtralLM(**cfg)


def test_mixtral_trains_compiled():
    lm = _mixtral(seed=0, vocab_size=24, max_len=8)
    opt = optim.Adam(lm.parameters(), lr=1e-2)
    crit = nn.MoECriterion(nn.CrossEntropyLoss(), lm)
    step = CompiledTrainStep(lm, opt, crit)
    seq = RNG.integers(0, 24, (8, 9)).astype(np.int32)
    x, y = seq[:, :8], seq[:, 1:]
    losses = [float(step(x, y)) for _ in range(60)]
    assert losses[-1] < 0.2 * losses[0], losses[::10]
    assert step._jitted._cache_size() == 1


def test_mixtral_kv_decode_matches_generate():
    lm = _mixtral()
    dec = KVCacheDecoder(lm)
    assert type(dec).__name__ == "MixtralKVCacheDecoder"
    idx = RNG.integers(0, 48, (3, 6)).astype(np.int64)
    want = lm.generate(idx.copy(), 10)
    got = dec.generate(idx.copy(), 10)
    np.testing.assert_array_equal(got, want)
    # GQA cache stays num_kv_heads wide (inherited Llama attention)
    import jax.numpy as jnp

    p = dec._prep_jit(dec._gather())
    prompt = np.zeros((3, lm.max_len), np.int32)
    prompt[:, :6] = idx
    kc, _, _ = dec._prefill_jit(p, jnp.asarray(prompt), 6)
    assert kc.shape == (2, 3, 2, lm.max_len, 8)  # (layers, B, Hkv, L, Dh)


def test_mixtral_kv_decode_bf16():
    import jax.numpy as jnp

    # pinned seed/prompt for well-separated logits (bf16 rounding near a
    # routing or argmax tie would legitimately flip outputs)
    lm = _mixtral(seed=0)
    idx = np.random.default_rng(7).integers(0, 48, (2, 6)).astype(np.int64)
    want = KVCacheDecoder(lm).generate(idx.copy(), 8)
    got = KVCacheDecoder(lm, compute_dtype=jnp.bfloat16).generate(
        idx.copy(), 8
    )
    np.testing.assert_array_equal(got, want)


def test_mixtral_ep_sharding():
    """expert_parallel_rules shard the stacked swiglu expert tensors over
    the mesh; the EP-sharded compiled step matches single-device."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from deepflows_tpu.parallel import ShardedTrainStep, expert_parallel_rules

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")

    def build():
        lm = _mixtral(seed=2, vocab_size=24, max_len=8, depth=1)
        opt = optim.Adam(lm.parameters(), lr=5e-3)
        crit = nn.MoECriterion(nn.CrossEntropyLoss(), lm)
        return lm, opt, crit

    seq = np.random.default_rng(0).integers(0, 24, (8, 9)).astype(np.int32)
    x, y = seq[:, :8], seq[:, 1:]

    lm, opt, crit = build()
    ref_step = CompiledTrainStep(lm, opt, crit)
    ref_losses = [float(ref_step(x, y)) for _ in range(5)]

    lm2, opt2, crit2 = build()
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("data", "model"))
    rules = expert_parallel_rules("model")
    # the stacked swiglu expert tensors must actually be sharded over the mesh
    specs = {n: rules(n, p.shape) for n, p in lm2.named_parameters()
             if ".experts_" in n}
    assert len(specs) == 3 and all(
        s == P("model", None, None) for s in specs.values()
    )
    step = ShardedTrainStep(lm2, opt2, crit2, mesh, param_rules=rules)
    losses = [float(step(x, y)) for _ in range(5)]
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-3, atol=1e-5)
