"""ModelEMA (jitted shadow-weight averaging) and DistributedSampler
(per-rank index sharding) — extensions; the reference has neither."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.utils.data import DistributedSampler, TensorDataset


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _tiny_model():
    df.manual_seed(0)
    return nn.Sequential(
        nn.Linear(4, 8, device="tpu"), nn.ReLU(), nn.Linear(8, 2, device="tpu")
    )


def _batch(rng, n=16):
    x = rng.standard_normal((n, 4)).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.int32)
    return x, y


# ---------------------------------------------------------------- ModelEMA
def test_ema_matches_numpy_reference():
    """shadow_t = d*shadow_{t-1} + (1-d)*w_t, with the warmup ramp."""
    model = _tiny_model()
    opt = optim.SGD(model.parameters(), lr=0.1)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    ema = optim.ModelEMA(model, decay=0.9, warmup=True)
    rng = np.random.default_rng(1)

    names = [n for n, _ in model.named_parameters()]
    expect = {n: np.asarray(p.data.array, np.float32)
              for n, p in model.named_parameters()}
    for t in range(5):
        x, y = _batch(rng)
        step(x, y)
        d = min(0.9, (1.0 + t) / (10.0 + t))
        for n, p in model.named_parameters():
            w = np.asarray(p.data.array, np.float32)
            expect[n] = expect[n] + (w - expect[n]) * (1.0 - d)
        ema.update()

    got = ema.state_dict()["shadow"]
    for n in names:
        np.testing.assert_allclose(got[n], expect[n], rtol=2e-5, atol=2e-6)


def test_ema_average_parameters_swaps_and_restores():
    model = _tiny_model()
    opt = optim.SGD(model.parameters(), lr=0.5)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    ema = optim.ModelEMA(model, decay=0.5, warmup=False)
    rng = np.random.default_rng(2)
    for _ in range(3):
        step(*_batch(rng))
        ema.update()

    live = {n: np.asarray(p.data.array) for n, p in model.named_parameters()}
    shadow = ema.state_dict()["shadow"]
    assert any(
        not np.allclose(live[n], shadow[n]) for n in live
    ), "EMA should lag the live weights"
    with ema.average_parameters():
        for n, p in model.named_parameters():
            np.testing.assert_allclose(
                np.asarray(p.data.array, np.float32), shadow[n], rtol=1e-6
            )
    for n, p in model.named_parameters():
        np.testing.assert_array_equal(np.asarray(p.data.array), live[n])


def test_ema_state_roundtrip_and_copy_to():
    model = _tiny_model()
    ema = optim.ModelEMA(model, decay=0.99)
    opt = optim.SGD(model.parameters(), lr=0.5)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    rng = np.random.default_rng(3)
    for _ in range(2):
        step(*_batch(rng))
        ema.update()
    state = ema.state_dict()

    model2 = _tiny_model()
    ema2 = optim.ModelEMA(model2, decay=0.5)
    ema2.load_state_dict(state)
    assert ema2.num_updates == 2 and ema2.decay == 0.99
    ema2.copy_to()
    for (n, p) in model2.named_parameters():
        np.testing.assert_allclose(
            np.asarray(p.data.array, np.float32), state["shadow"][n], rtol=1e-6
        )


def test_ema_bf16_compute_keeps_f32_shadow():
    import jax.numpy as jnp

    model = _tiny_model()
    opt = optim.Adam(model.parameters(), lr=1e-2)
    step = CompiledTrainStep(
        model, opt, nn.CrossEntropyLoss(), compute_dtype=jnp.bfloat16
    )
    ema = optim.ModelEMA(model, decay=0.9)
    rng = np.random.default_rng(4)
    for _ in range(2):
        step(*_batch(rng))
        ema.update()
    for s in ema._shadow:
        assert s.dtype == jnp.float32


# ------------------------------------------------------- DistributedSampler
def test_distributed_sampler_partitions_disjoint_and_complete():
    ds = TensorDataset(np.arange(23, dtype=np.float32))
    parts = []
    for r in range(4):
        s = DistributedSampler(ds, num_replicas=4, rank=r, shuffle=True, seed=7)
        idx = list(s)
        assert len(idx) == len(s) == 6  # ceil(23/4), padded
        parts.append(idx)
    flat = [i for p in parts for i in p]
    # wrap-around pad duplicates exactly total-n=1 index; coverage is full
    assert set(flat) == set(range(23))
    assert len(flat) == 24


def test_distributed_sampler_drop_last_truncates():
    ds = TensorDataset(np.arange(23, dtype=np.float32))
    parts = [
        list(DistributedSampler(ds, 4, r, shuffle=False, drop_last=True))
        for r in range(4)
    ]
    assert all(len(p) == 5 for p in parts)
    assert sorted(i for p in parts for i in p) == list(range(20))
    # rank-strided: rank r takes order[r::4] of the UNSHUFFLED range
    assert parts[1] == list(range(1, 20, 4))


def test_distributed_sampler_set_epoch_reshuffles_in_lockstep():
    ds = TensorDataset(np.arange(32, dtype=np.float32))
    a = DistributedSampler(ds, 2, 0, seed=5)
    b = DistributedSampler(ds, 2, 1, seed=5)
    e0 = (list(a), list(b))
    a.set_epoch(1), b.set_epoch(1)
    e1 = (list(a), list(b))
    assert e0[0] != e1[0], "epoch must reshuffle"
    assert set(e0[0]) | set(e0[1]) == set(range(32))
    assert set(e1[0]) | set(e1[1]) == set(range(32))
    assert not (set(e1[0]) & set(e1[1])), "ranks must stay disjoint"


def test_distributed_sampler_feeds_dataloader():
    from deepflows_tpu.utils.data import DataLoader

    x = np.arange(40, dtype=np.float32).reshape(20, 2)
    y = np.arange(20, dtype=np.int64)
    ds = TensorDataset(x, y)
    s = DistributedSampler(ds, num_replicas=2, rank=1, shuffle=False)
    dl = DataLoader(ds, batch_size=5, sampler=s)
    xs = np.concatenate([np.asarray(xb) for xb, _ in dl])
    np.testing.assert_array_equal(xs[:, 0], np.arange(2, 40, 4, dtype=np.float32))
