"""Optimizer + scheduler tests, differential vs torch.optim on identical toy
problems, plus the pure-update path used by compiled train steps."""

import numpy as np
import pytest
import torch

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean_tape():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def run_steps(make_opt, make_topt, n_steps=5, device="cpu"):
    """Quadratic loss on one weight; return our/torch trajectories."""
    w0 = RNG.standard_normal((3, 2)).astype(np.float32)
    g_seq = [RNG.standard_normal((3, 2)).astype(np.float32) for _ in range(n_steps)]

    p = nn.Parameter(Tensor(w0.copy(), device=device))
    opt = make_opt([p])
    for g in g_seq:
        p.grad = df.BackendTensor(g, device=p.device)
        opt.step()
    ours = p.numpy()

    pt = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = make_topt([pt])
    for g in g_seq:
        pt.grad = torch.tensor(g)
        topt.step()
    return ours, pt.detach().numpy()


@pytest.mark.parametrize("dev", ["cpu", "tpu"])
def test_sgd_matches_torch(dev):
    ours, want = run_steps(
        lambda ps: optim.SGD(ps, lr=0.1),
        lambda ps: torch.optim.SGD(ps, lr=0.1),
        device=dev,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)


def test_sgd_momentum_weight_decay_matches_torch():
    ours, want = run_steps(
        lambda ps: optim.SGD(ps, lr=0.05, momentum=0.9, weight_decay=0.01),
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.9, weight_decay=0.01),
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_sgd_nesterov_matches_torch():
    ours, want = run_steps(
        lambda ps: optim.SGD(ps, lr=0.05, momentum=0.9, nesterov=True),
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.9, nesterov=True),
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dev", ["cpu", "tpu"])
def test_adam_matches_torch(dev):
    ours, want = run_steps(
        lambda ps: optim.Adam(ps, lr=0.01, weight_decay=0.01),
        lambda ps: torch.optim.Adam(ps, lr=0.01, weight_decay=0.01),
        n_steps=8,
        device=dev,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_adagrad_matches_torch():
    ours, want = run_steps(
        lambda ps: optim.Adagrad(ps, lr=0.05),
        lambda ps: torch.optim.Adagrad(ps, lr=0.05, eps=1e-10),
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_adadelta_matches_torch():
    ours, want = run_steps(
        lambda ps: optim.Adadelta(ps, lr=1.0, rho=0.9, eps=1e-6),
        lambda ps: torch.optim.Adadelta(ps, lr=1.0, rho=0.9, eps=1e-6),
        n_steps=6,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_frozen_params_skipped():
    p = nn.Parameter(Tensor(np.ones((2, 2), np.float32)))
    opt = optim.SGD([p], lr=0.5)
    p.grad = None
    opt.step()  # no grad -> unchanged
    np.testing.assert_allclose(p.numpy(), 1.0)


def test_end_to_end_training_reduces_loss(device):
    """MLP on a separable toy problem converges (the reference's acceptance
    style: training scripts that must converge, SURVEY §4)."""
    df.manual_seed(0)
    n = 128
    x = RNG.standard_normal((n, 10)).astype(np.float32)
    true_w = RNG.standard_normal((10, 3)).astype(np.float32)
    labels = (x @ true_w).argmax(1)

    model = nn.Sequential(
        nn.Linear(10, 32, device=device), nn.ReLU(), nn.Linear(32, 3, device=device)
    )
    opt = optim.Adam(model.parameters(), lr=0.02)
    lossf = nn.CrossEntropyLoss()
    first = last = None
    for i in range(60):
        xt = Tensor(x, device=device)
        yt = Tensor(labels.astype(np.int32), device=device)
        out = model(xt)
        loss = lossf(out, yt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        v = float(loss.numpy())
        first = first if first is not None else v
        last = v
    assert last < first * 0.3, (first, last)
    acc = (model(Tensor(x, device=device)).numpy().argmax(1) == labels).mean()
    assert acc > 0.85


# --------------------------------------------------------------- schedulers
class _FakeOpt:
    def __init__(self, lr):
        self.lr = lr


def test_step_lr():
    opt = _FakeOpt(1.0)
    sch = optim.StepLR(opt, step_size=2, gamma=0.1)
    lrs = []
    for _ in range(5):
        sch.step()
        lrs.append(opt.lr)
    np.testing.assert_allclose(lrs, [1.0, 1.0, 0.1, 0.1, 0.01], rtol=1e-6)


def test_cosine_annealing_lr():
    opt = _FakeOpt(1.0)
    sch = optim.CosineAnnealingLR(opt, T_max=10, eta_min=0.0)
    sch.step()  # epoch 0
    np.testing.assert_allclose(opt.lr, 1.0, rtol=1e-6)
    for _ in range(5):
        sch.step()
    np.testing.assert_allclose(opt.lr, 0.5, atol=1e-6)  # cos(pi/2)


def test_warmup_cosine_lr():
    opt = _FakeOpt(1.0)
    sch = optim.WarmupCosineLR(opt, warmup_epochs=5, T_max=10, warmup_start_lr=0.0)
    sch.step()  # epoch 0 -> lr 0
    np.testing.assert_allclose(opt.lr, 0.0, atol=1e-9)
    for _ in range(5):
        sch.step()
    np.testing.assert_allclose(opt.lr, 1.0, rtol=1e-6)  # end of warmup
    for _ in range(5):
        sch.step()
    np.testing.assert_allclose(opt.lr, 0.5, atol=1e-6)


def test_scheduler_drives_optimizer_lr_without_retrace():
    p = nn.Parameter(Tensor(np.ones((2,), np.float32)))
    opt = optim.SGD([p], lr=1.0)
    sch = optim.StepLR(opt, step_size=1, gamma=0.5)
    p.grad = df.BackendTensor(np.ones((2,), np.float32))
    opt.step()
    sch.step()
    sch.step()
    assert opt.lr == 0.5
    opt.step()
    np.testing.assert_allclose(p.numpy(), 1.0 - 1.0 - 0.5)


@pytest.mark.parametrize("dev", ["cpu", "tpu"])
def test_adamw_matches_torch(dev):
    ours, want = run_steps(
        lambda ps: optim.AdamW(ps, lr=0.01, weight_decay=0.1),
        lambda ps: torch.optim.AdamW(ps, lr=0.01, weight_decay=0.1),
        device=dev,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-6)


def test_adamw_decoupling_differs_from_adam():
    """AdamW's decay must NOT flow through the adaptive denominator."""
    ours_w, _ = run_steps(
        lambda ps: optim.AdamW(ps, lr=0.01, weight_decay=0.5),
        lambda ps: torch.optim.AdamW(ps, lr=0.01, weight_decay=0.5),
    )
    ours_a, _ = run_steps(
        lambda ps: optim.Adam(ps, lr=0.01, weight_decay=0.5),
        lambda ps: torch.optim.Adam(ps, lr=0.01, weight_decay=0.5),
    )
    assert np.abs(ours_w - ours_a).max() > 1e-4


@pytest.mark.parametrize("dev", ["cpu", "tpu"])
def test_rmsprop_matches_torch(dev):
    ours, want = run_steps(
        lambda ps: optim.RMSprop(ps, lr=0.01, alpha=0.95),
        lambda ps: torch.optim.RMSprop(ps, lr=0.01, alpha=0.95),
        device=dev,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-6)


def test_rmsprop_momentum_centered_wd_matches_torch():
    ours, want = run_steps(
        lambda ps: optim.RMSprop(
            ps, lr=0.01, momentum=0.9, centered=True, weight_decay=0.01
        ),
        lambda ps: torch.optim.RMSprop(
            ps, lr=0.01, momentum=0.9, centered=True, weight_decay=0.01
        ),
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-6)


def test_adamw_rmsprop_in_compiled_step():
    """Both new optimizers must run inside CompiledTrainStep (traceable
    pure cores, no retrace across steps)."""
    from deepflows_tpu.jit import CompiledTrainStep

    for make in (
        lambda ps: optim.AdamW(ps, lr=1e-3),
        lambda ps: optim.RMSprop(ps, lr=1e-3, momentum=0.9, centered=True),
    ):
        df.manual_seed(0)
        model = nn.Sequential(
            nn.Linear(8, 16, device="tpu"), nn.ReLU(), nn.Linear(16, 4, device="tpu")
        )
        opt = make(model.parameters())
        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
        r = np.random.default_rng(0)
        x = r.standard_normal((16, 8)).astype(np.float32)
        y = r.integers(0, 4, 16).astype(np.int32)
        losses = [float(step(x, y)) for _ in range(10)]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        # exactly ONE compile: host scalars in optimizer state (step counter)
        # must not force a second trace after call 1
        assert step._jitted._cache_size() == 1
