"""LoRA parameter-efficient fine-tuning (nn/lora.py): exact identity at
init, adapter-only training, merge/unmerge, adapter checkpoints, target
selection, compiled-step integration.  No reference analog."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _mlp(seed=0):
    df.manual_seed(seed)
    return nn.Sequential(
        nn.Linear(8, 16, device="tpu"), nn.ReLU(),
        nn.Linear(16, 4, device="tpu"),
    )


def _fwd(m, x):
    m.eval()
    from deepflows_tpu.autograd import no_grad

    with no_grad():
        return np.asarray(m(Tensor(x, device="tpu")).data.array)


def test_lora_is_identity_at_init():
    """B is zero-init: the wrapped model computes exactly the base."""
    x = RNG.standard_normal((5, 8)).astype(np.float32)
    m = _mlp()
    want = _fwd(m, x)
    nn.apply_lora(m, r=4)
    np.testing.assert_array_equal(_fwd(m, x), want)


def test_lora_trains_only_adapters():
    m = _mlp()
    adapters = nn.apply_lora(m, r=4)
    assert len(adapters) == 4  # A+B for each of 2 Linears
    trainable = [p for p in m.parameters() if p.requires_grad]
    assert set(map(id, trainable)) == set(map(id, adapters))
    base_w = [np.asarray(mod.base.weight.data.array).copy()
              for mod in m.modules() if isinstance(mod, nn.LoRALinear)]

    x = RNG.standard_normal((32, 8)).astype(np.float32)
    y = RNG.standard_normal((32, 4)).astype(np.float32)
    opt = optim.Adam(adapters, lr=1e-2)
    crit = nn.MSELoss()
    first = None
    for _ in range(40):
        loss = crit(m(Tensor(x, device="tpu")), Tensor(y, device="tpu"))
        if first is None:
            first = float(loss.numpy())
        opt.zero_grad()
        loss.backward()
        opt.step()
        Graph.free_graph_all()
    assert float(loss.numpy()) < 0.6 * first
    for mod, w0 in zip(
        (mm for mm in m.modules() if isinstance(mm, nn.LoRALinear)), base_w
    ):
        np.testing.assert_array_equal(
            np.asarray(mod.base.weight.data.array), w0
        )  # base untouched
        assert float(np.abs(np.asarray(mod.lora_B.data.array)).max()) > 0


def test_lora_merge_unmerge_roundtrip():
    x = RNG.standard_normal((6, 8)).astype(np.float32)
    m = _mlp()
    nn.apply_lora(m, r=4)
    # make the adapters non-trivial
    for mod in m.modules():
        if isinstance(mod, nn.LoRALinear):
            from deepflows_tpu.backend import BackendTensor

            mod.lora_B.data = BackendTensor(
                RNG.standard_normal(mod.lora_B.shape).astype(np.float32) * 0.1,
                device=mod.lora_B.device,
            )
    adapted = _fwd(m, x)
    nn.merge_lora(m)
    merged = _fwd(m, x)
    np.testing.assert_allclose(merged, adapted, rtol=1e-5, atol=1e-6)
    nn.unmerge_lora(m)
    np.testing.assert_allclose(_fwd(m, x), adapted, rtol=1e-5, atol=1e-5)


def test_lora_adapter_checkpoint_roundtrip():
    x = RNG.standard_normal((4, 8)).astype(np.float32)
    m1 = _mlp(seed=3)
    nn.apply_lora(m1, r=4)
    from deepflows_tpu.backend import BackendTensor

    for mod in m1.modules():
        if isinstance(mod, nn.LoRALinear):
            mod.lora_B.data = BackendTensor(
                RNG.standard_normal(mod.lora_B.shape).astype(np.float32) * 0.2,
                device=mod.lora_B.device,
            )
    sd = nn.lora_state_dict(m1)
    assert len(sd) == 4 and all(v.size for v in sd.values())

    m2 = _mlp(seed=3)  # identical base
    nn.apply_lora(m2, r=4)
    nn.load_lora_state_dict(m2, sd)
    np.testing.assert_allclose(_fwd(m2, x), _fwd(m1, x), rtol=1e-6)

    with pytest.raises(KeyError):
        nn.load_lora_state_dict(m2, {**sd, "bogus.lora_A": sd[next(iter(sd))]})


def test_lora_target_selection_on_transformer():
    """Adapt only q/v projections of a TransformerLM (the standard LoRA
    recipe) — adapter count and trainable-parameter fraction check."""
    from deepflows_tpu import models

    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=32, max_len=8, dim=32, depth=2,
                              num_heads=2, device="tpu")
    total = sum(int(np.prod(p.shape)) for p in lm.parameters())
    adapters = nn.apply_lora(lm, r=2, target=["q_proj", "v_proj"])
    assert len(adapters) == 2 * 2 * 2  # 2 layers x (q, v) x (A, B)
    trainable = sum(
        int(np.prod(p.shape)) for p in lm.parameters() if p.requires_grad
    )
    assert trainable < 0.05 * total
    x = RNG.integers(0, 32, (2, 8)).astype(np.int64)
    out = lm(Tensor(x, device="tpu"))
    assert out.shape == (2, 8, 32)


def test_lora_in_compiled_step():
    """CompiledTrainStep with an adapter-only optimizer trains; frozen base
    params stay bit-identical through the jitted path."""
    from deepflows_tpu.jit import CompiledTrainStep

    m = _mlp(seed=5)
    adapters = nn.apply_lora(m, r=4)
    base0 = [np.asarray(mod.base.weight.data.array).copy()
             for mod in m.modules() if isinstance(mod, nn.LoRALinear)]
    opt = optim.Adam(adapters, lr=1e-2)
    step = CompiledTrainStep(m, opt, nn.MSELoss())
    x = RNG.standard_normal((32, 8)).astype(np.float32)
    y = RNG.standard_normal((32, 4)).astype(np.float32)
    first = float(step(x, y))
    for _ in range(30):
        last = float(step(x, y))
    assert last < 0.6 * first, (first, last)
    for mod, w0 in zip(
        (mm for mm in m.modules() if isinstance(mm, nn.LoRALinear)), base0
    ):
        np.testing.assert_array_equal(
            np.asarray(mod.base.weight.data.array), w0
        )


def test_lora_decoder_guard_and_merged_decode():
    """KVCacheDecoder gathers raw projection weights, so an UNMERGED
    adapter must be rejected (silent drop otherwise); after merge_lora the
    decode matches the adapted tape forward's greedy tokens."""
    from deepflows_tpu import models
    from deepflows_tpu.backend import BackendTensor

    df.manual_seed(2)
    lm = models.TransformerLM(vocab_size=32, max_len=8, dim=32, depth=2,
                              num_heads=2, device="tpu")
    nn.apply_lora(lm, r=2, target=["q_proj", "v_proj"])
    for mod in lm.modules():
        if isinstance(mod, nn.LoRALinear):
            mod.lora_B.data = BackendTensor(
                RNG.standard_normal(mod.lora_B.shape).astype(np.float32) * 0.3,
                device=mod.lora_B.device,
            )
    with pytest.raises(RuntimeError, match="merge_lora"):
        models.KVCacheDecoder(lm)

    x = RNG.integers(0, 32, (2, 4)).astype(np.int64)
    lm.eval()
    from deepflows_tpu.autograd import no_grad

    with no_grad():
        adapted = np.asarray(lm(Tensor(x, device="tpu")).data.array)
    nn.merge_lora(lm)
    dec = models.KVCacheDecoder(lm)
    out = dec.generate(x, 3)
    with no_grad():
        merged = np.asarray(lm(Tensor(x, device="tpu")).data.array)
    np.testing.assert_allclose(merged, adapted, rtol=1e-4, atol=1e-5)
    assert out.shape == (2, 7)
