"""Large-model optimizers (Adafactor / Lion / Muon): differential vs
torch.optim (Adafactor) or a hand-built twin (Lion), Newton-Schulz
orthogonality properties (Muon), end-to-end training, compiled-step
integration.  No reference analog (the reference stops at Adam)."""

import numpy as np
import pytest
import torch

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim

RNG = np.random.default_rng(3)


@pytest.fixture(autouse=True)
def _clean_tape():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def run_steps(make_opt, make_topt, shape=(3, 2), n_steps=5, device="cpu"):
    w0 = RNG.standard_normal(shape).astype(np.float32)
    g_seq = [RNG.standard_normal(shape).astype(np.float32) for _ in range(n_steps)]

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


# --------------------------------------------------------------- Adafactor
@pytest.mark.parametrize("dev", ["cpu", "tpu"])
def test_adafactor_matches_torch_2d(dev):
    ours, want = run_steps(
        lambda ps: optim.Adafactor(ps, lr=0.02),
        lambda ps: torch.optim.Adafactor(ps, lr=0.02),
        shape=(4, 6),
        device=dev,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_adafactor_matches_torch_1d_and_wd():
    ours, want = run_steps(
        lambda ps: optim.Adafactor(ps, lr=0.05, weight_decay=0.01),
        lambda ps: torch.optim.Adafactor(ps, lr=0.05, weight_decay=0.01),
        shape=(7,),
        n_steps=8,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_adafactor_matches_torch_conv_shape():
    """>2-D params factor over the LAST TWO axes (leading axes batched)."""
    ours, want = run_steps(
        lambda ps: optim.Adafactor(ps, lr=0.03),
        lambda ps: torch.optim.Adafactor(ps, lr=0.03),
        shape=(2, 3, 4, 5),
        n_steps=6,
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_adafactor_state_memory_is_factored():
    """The whole point: a (128, 64) param stores 128 + 64 second-moment
    entries, not 128*64."""
    p = nn.Parameter(Tensor(np.zeros((128, 64), np.float32), device="tpu"))
    opt = optim.Adafactor([p])
    st = opt.init_state()
    assert st["row"][0].shape == (128, 1) and st["col"][0].shape == (1, 64)
    assert st["var"][0] is None


# -------------------------------------------------------------------- Lion
def _lion_twin(w0, g_seq, lr, b1, b2, wd):
    w, m = w0.copy(), np.zeros_like(w0)
    for g in g_seq:
        u = np.sign(b1 * m + (1 - b1) * g)
        w = w - lr * (u + wd * w)
        m = b2 * m + (1 - b2) * g
    return w


@pytest.mark.parametrize("dev", ["cpu", "tpu"])
def test_lion_matches_twin(dev):
    w0 = RNG.standard_normal((5, 3)).astype(np.float32)
    g_seq = [RNG.standard_normal((5, 3)).astype(np.float32) for _ in range(6)]
    p = nn.Parameter(Tensor(w0.copy(), device=dev))
    opt = optim.Lion([p], lr=3e-3, betas=(0.9, 0.99), weight_decay=0.1)
    for g in g_seq:
        p.grad = df.BackendTensor(g, device=p.device)
        opt.step()
    want = _lion_twin(w0, g_seq, 3e-3, 0.9, 0.99, 0.1)
    np.testing.assert_allclose(p.numpy(), want, rtol=1e-5, atol=1e-6)


# -------------------------------------------------------------------- Muon
def test_newton_schulz_orthogonalizes():
    """NS5 output approximates the SVD orthogonal factor U V^T: singular
    values near 1, strong alignment with the exact polar factor."""
    from deepflows_tpu.optim.muon import ns_orthogonalize

    for shape in [(16, 32), (32, 16), (24, 24)]:
        g = RNG.standard_normal(shape).astype(np.float32)
        o = ns_orthogonalize(g)
        s = np.linalg.svd(o, compute_uv=False)
        assert s.max() < 1.35 and s.min() > 0.45, (shape, s.min(), s.max())
        u, _, vt = np.linalg.svd(g, full_matrices=False)
        uvt = u @ vt
        align = float((o * uvt).sum() / min(shape))
        assert align > 0.85, (shape, align)


def test_muon_trains_mlp():
    """Muon on the hidden matrices (AdamW fallback on biases) fits a toy
    regression; loss must drop by 10x."""
    df.manual_seed(0)
    model = nn.Sequential(
        nn.Linear(8, 32, device="tpu"), nn.ReLU(), nn.Linear(32, 1, device="tpu")
    )
    opt = optim.Muon(model.parameters(), lr=0.02, adamw_lr=3e-3)
    x = RNG.standard_normal((64, 8)).astype(np.float32)
    y = (x[:, :1] * 2 - x[:, 1:2]).astype(np.float32)
    crit = nn.MSELoss()
    first = None
    for _ in range(150):
        out = model(Tensor(x, device="tpu"))
        loss = crit(out, Tensor(y, device="tpu"))
        if first is None:
            first = float(loss.numpy())
        opt.zero_grad()
        loss.backward()
        opt.step()
        Graph.free_graph_all()
    last = float(loss.numpy())
    assert last < 0.1 * first, (first, last)


def test_muon_fallback_state_slots():
    pw = nn.Parameter(Tensor(np.zeros((4, 4), np.float32), device="tpu"))
    pb = nn.Parameter(Tensor(np.zeros((4,), np.float32), device="tpu"))
    opt = optim.Muon([pw, pb])
    st = opt.init_state()
    assert st["v"][0] is None  # muon branch: momentum only
    assert st["v"][1] is not None  # adamw fallback carries second moment


# ------------------------------------------------------ compiled-step path
@pytest.mark.parametrize("make", [
    lambda ps: optim.Adafactor(ps, lr=0.02),
    lambda ps: optim.Lion(ps, lr=1e-3, weight_decay=0.01),
    lambda ps: optim.Muon(ps, lr=0.02),
])
def test_new_optimizers_in_compiled_step(make):
    """Eager step() and CompiledTrainStep produce the same trajectory —
    the pure cores are trace-safe (incl. Muon's NS matmul loop)."""
    from deepflows_tpu.jit import CompiledTrainStep

    x = RNG.standard_normal((16, 6)).astype(np.float32)
    y = RNG.standard_normal((16, 2)).astype(np.float32)

    def build():
        df.manual_seed(7)
        return nn.Sequential(
            nn.Linear(6, 8, device="tpu"), nn.Tanh(),
            nn.Linear(8, 2, device="tpu"),
        )

    m1 = build()
    opt1 = make(m1.parameters())
    crit = nn.MSELoss()
    for _ in range(4):
        loss = crit(m1(Tensor(x, device="tpu")), Tensor(y, device="tpu"))
        opt1.zero_grad()
        loss.backward()
        opt1.step()
        Graph.free_graph_all()

    m2 = build()
    opt2 = make(m2.parameters())
    step = CompiledTrainStep(m2, opt2, nn.MSELoss())
    for _ in range(4):
        step(x, y)

    for p1, p2 in zip(m1.parameters(), m2.parameters()):
        np.testing.assert_allclose(
            p1.numpy(), p2.numpy(), rtol=2e-4, atol=2e-5
        )


def test_new_optimizers_checkpoint_roundtrip(tmp_path):
    """state_dict/load_state_dict resume exactly (incl. Adafactor's
    factored slots with None placeholders)."""
    for make in [
        lambda ps: optim.Adafactor(ps, lr=0.02),
        lambda ps: optim.Lion(ps, lr=1e-3),
        lambda ps: optim.Muon(ps, lr=0.02),
    ]:
        w = nn.Parameter(Tensor(RNG.standard_normal((4, 3)).astype(np.float32), device="tpu"))
        b = nn.Parameter(Tensor(RNG.standard_normal((3,)).astype(np.float32), device="tpu"))
        opt = make([w, b])
        for _ in range(3):
            w.grad = df.BackendTensor(
                RNG.standard_normal((4, 3)).astype(np.float32), device=w.device)
            b.grad = df.BackendTensor(
                RNG.standard_normal((3,)).astype(np.float32), device=b.device)
            opt.step()
        sd = opt.state_dict()

        w2 = nn.Parameter(Tensor(w.numpy(), device="tpu"))
        b2 = nn.Parameter(Tensor(b.numpy(), device="tpu"))
        opt2 = make([w2, b2])
        opt2.load_state_dict(sd)
        g1 = RNG.standard_normal((4, 3)).astype(np.float32)
        g2 = RNG.standard_normal((3,)).astype(np.float32)
        for o, ww, bb in ((opt, w, b), (opt2, w2, b2)):
            ww.grad = df.BackendTensor(g1.copy(), device=ww.device)
            bb.grad = df.BackendTensor(g2.copy(), device=bb.device)
            o.step()
        np.testing.assert_allclose(w.numpy(), w2.numpy(), rtol=1e-6)
        np.testing.assert_allclose(b.numpy(), b2.numpy(), rtol=1e-6)


# -------------------------------------------------------------- schedulers
def test_linear_lr_matches_torch():
    p = nn.Parameter(Tensor(np.zeros((2,), np.float32)))
    opt = optim.SGD([p], lr=0.5)
    sch = optim.LinearLR(opt, start_factor=0.25, end_factor=1.0, total_iters=4)
    tp = torch.nn.Parameter(torch.zeros(2))
    topt = torch.optim.SGD([tp], lr=0.5)
    tsch = torch.optim.lr_scheduler.LinearLR(
        topt, start_factor=0.25, end_factor=1.0, total_iters=4)
    ours, theirs = [], []
    for _ in range(8):
        sch.step()
        ours.append(opt.lr)
        theirs.append(topt.param_groups[0]["lr"])
        topt.step()
        tsch.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_onecycle_lr_matches_torch():
    p = nn.Parameter(Tensor(np.zeros((2,), np.float32)))
    opt = optim.SGD([p], lr=0.1)
    sch = optim.OneCycleLR(opt, max_lr=1.0, total_steps=10, pct_start=0.3)
    tp = torch.nn.Parameter(torch.zeros(2))
    topt = torch.optim.SGD([tp], lr=0.1)
    tsch = torch.optim.lr_scheduler.OneCycleLR(
        topt, max_lr=1.0, total_steps=10, pct_start=0.3,
        anneal_strategy="cos", cycle_momentum=False)
    ours = [opt.lr]
    theirs = [topt.param_groups[0]["lr"]]
    for _ in range(9):
        sch.step()
        ours.append(opt.lr)
        topt.step()
        tsch.step()
        theirs.append(topt.param_groups[0]["lr"])
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)


def test_new_schedulers_state_roundtrip():
    p = nn.Parameter(Tensor(np.zeros((2,), np.float32)))
    opt = optim.SGD([p], lr=0.5)
    sch = optim.OneCycleLR(opt, max_lr=1.0, total_steps=10)
    for _ in range(4):
        sch.step()
    sd = sch.state_dict()
    opt2 = optim.SGD([p], lr=0.5)
    sch2 = optim.OneCycleLR(opt2, max_lr=1.0, total_steps=10)
    sch2.load_state_dict(sd)
    sch.step()
    sch2.step()
    assert abs(opt.lr - opt2.lr) < 1e-12
