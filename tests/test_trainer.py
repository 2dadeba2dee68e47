"""Trainer (high-level fit loop) + bf16 opt-in tests."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim
from deepflows_tpu.utils import Trainer

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_trainer_fit_and_early_stop(tmp_path):
    df.manual_seed(0)
    x = RNG.standard_normal((256, 12)).astype(np.float32)
    w = RNG.standard_normal((12, 3)).astype(np.float32)
    y = (x @ w).argmax(1).astype(np.int32)
    model = nn.Sequential(
        nn.Linear(12, 32, device="tpu"), nn.ReLU(), nn.Linear(32, 3, device="tpu")
    )
    opt = optim.Adam(model.parameters(), lr=0.02)
    logs = []
    trainer = Trainer(
        model,
        opt,
        nn.CrossEntropyLoss(),
        scheduler=optim.CosineAnnealingLR(opt, T_max=30),
        checkpoint_path=str(tmp_path / "ck.pkl"),
        log_fn=logs.append,
    )
    hist = trainer.fit(x, y, x, y, epochs=30, batch_size=64, target_acc=95.0)
    assert hist["loss"][-1] < hist["loss"][0]
    assert hist["test_acc"][-1] > 0.9
    assert len(hist["loss"]) < 30  # early-stopped
    assert (tmp_path / "ck.pkl").exists()
    assert any("early stop" in l for l in logs)


def test_bf16_optin_forward():
    """bfloat16 is the documented opt-in extension (SURVEY §7.3 item 7)."""
    import jax.numpy as jnp

    x = RNG.standard_normal((4, 8)).astype(np.float32)
    t = Tensor(x, dtype=jnp.bfloat16, device="tpu")
    assert t.dtype == jnp.bfloat16
    lin = nn.Linear(8, 4, device="tpu", dtype=jnp.bfloat16)
    assert lin.weight.dtype == jnp.bfloat16
    out = lin(t)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out.numpy(), dtype=np.float32)).all()


def test_trainer_with_sharded_steps():
    """The high-level Trainer drives mesh-parallel steps when injected."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from deepflows_tpu.parallel import (
        ShardedEvalStep,
        ShardedTrainStep,
        make_mesh,
    )

    df.manual_seed(0)
    model = nn.Sequential(
        nn.Flatten(),
        nn.Linear(64, 32, device="tpu"),
        nn.ReLU(),
        nn.Linear(32, 4, device="tpu"),
    )
    opt = optim.Adam(model.parameters(), lr=5e-3)
    crit = nn.CrossEntropyLoss()
    mesh = make_mesh({"data": 8})
    trainer = Trainer(
        model, opt, crit,
        step=ShardedTrainStep(model, opt, crit, mesh),
        eval_step=ShardedEvalStep(model, mesh),
        log_fn=lambda s: None,
    )
    r = np.random.default_rng(0)
    x = r.standard_normal((256, 8, 8)).astype(np.float32)
    w = r.standard_normal((64, 4)).astype(np.float32)
    y = (x.reshape(256, -1) @ w).argmax(1).astype(np.int32)
    hist = trainer.fit(x[:192], y[:192], x[192:], y[192:], epochs=4, batch_size=64)
    assert hist["loss"][-1] < hist["loss"][0]
    assert len(hist["test_acc"]) == 4


def test_trainer_with_pipelined_step():
    """The Trainer also drives GPipe pipeline training (step=PipelinedTrainStep,
    eval_step=step.eval_logits)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from deepflows_tpu.parallel import (
        PipelinedTrainStep,
        PipelineStack,
        make_mesh,
    )

    df.manual_seed(0)
    stack = PipelineStack(
        [
            nn.Sequential(nn.Linear(16, 16, device="tpu"), nn.ReLU())
            for _ in range(4)
        ]
    )
    head_w = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)

    class PipeWithHead:
        """step adapter: pipeline stages then a fixed linear readout for CE."""

        def __init__(self, inner):
            self.inner = inner
            self.mesh = inner.mesh

        def __call__(self, x, y):
            # train the stack against a regression target derived from y
            target = np.eye(16, dtype=np.float32)[y % 16]
            return self.inner(x, target)

    opt = optim.Adam(stack.parameters(), lr=1e-3)
    mesh = make_mesh({"data": 2, "pipe": 4})
    inner = PipelinedTrainStep(stack, opt, nn.MSELoss(), mesh, n_micro=4)
    r = np.random.default_rng(0)
    x = r.standard_normal((128, 16)).astype(np.float32)
    y = (x @ np.arange(16 * 4).reshape(16, 4)).argmax(1).astype(np.int32)

    def eval_step(xb):
        return np.asarray(inner.eval_logits(xb)) @ head_w

    trainer = Trainer(
        None, opt, None, step=PipeWithHead(inner), eval_step=eval_step,
        log_fn=lambda s: None,
    )
    hist = trainer.fit(x[:96], y[:96], x[96:], y[96:], epochs=2, batch_size=32)
    assert len(hist["loss"]) == 2
    assert all(np.isfinite(hist["loss"]))
