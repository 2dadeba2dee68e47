"""nn library tests: differential vs torch (CPU golden oracle), finite
differences for conv/pool/bn gradients, cross-device agreement, Module
mechanics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn
from deepflows_tpu.nn import functional as F

RNG = np.random.default_rng(0)


def t2n(t):
    return t.detach().numpy()


@pytest.fixture(autouse=True)
def _clean_tape():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


# --------------------------------------------------------------- activations
def test_activations_match_torch(device):
    x = RNG.standard_normal((4, 7)).astype(np.float32)
    tx = Tensor(x, device=device)
    xt = torch.tensor(x)
    np.testing.assert_allclose(F.relu(tx).numpy(), tF.relu(xt).numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        F.sigmoid(tx).numpy(), torch.sigmoid(xt).numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(F.tanh(tx).numpy(), torch.tanh(xt).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        F.gelu(tx).numpy(), tF.gelu(xt).numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        F.gelu(tx, "tanh").numpy(),
        tF.gelu(xt, approximate="tanh").numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        F.leaky_relu(tx, 0.1).numpy(), tF.leaky_relu(xt, 0.1).numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        F.softmax(tx, 1).numpy(), tF.softmax(xt, dim=1).numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        F.log_softmax(tx, 1).numpy(),
        tF.log_softmax(xt, dim=1).numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_sigmoid_tanh_gelu_grads():
    x = RNG.standard_normal((3, 5)).astype(np.float32)
    for fn, tfn in [
        (F.sigmoid, torch.sigmoid),
        (F.tanh, torch.tanh),
        (lambda t: F.gelu(t), tF.gelu),
        (lambda t: F.gelu(t, "tanh"), lambda t: tF.gelu(t, approximate="tanh")),
    ]:
        tx = Tensor(x.copy(), requires_grad=True)
        fn(tx).sum().backward()
        xt = torch.tensor(x, requires_grad=True)
        tfn(xt).sum().backward()
        np.testing.assert_allclose(
            tx.grad.numpy(), xt.grad.numpy(), rtol=1e-4, atol=1e-5
        )


# --------------------------------------------------------------- losses
def test_mse_l1_losses_match_torch(device):
    a = RNG.standard_normal((5, 3)).astype(np.float32)
    b = RNG.standard_normal((5, 3)).astype(np.float32)
    ta, tb = Tensor(a, device=device), Tensor(b, device=device)
    np.testing.assert_allclose(
        nn.MSELoss()(ta, tb).numpy(), tF.mse_loss(torch.tensor(a), torch.tensor(b)).numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        nn.L1Loss()(ta, tb).numpy(), tF.l1_loss(torch.tensor(a), torch.tensor(b)).numpy(), rtol=1e-5
    )


def test_cross_entropy_matches_torch(device):
    logits = RNG.standard_normal((6, 4)).astype(np.float32) * 2
    labels = RNG.integers(0, 4, 6)
    onehot = np.eye(4, dtype=np.float32)[labels]
    want = tF.cross_entropy(torch.tensor(logits), torch.tensor(labels)).numpy()
    got_onehot = nn.CrossEntropyLoss()(
        Tensor(logits, device=device), Tensor(onehot, device=device)
    ).numpy()
    got_int = nn.CrossEntropyLoss()(
        Tensor(logits, device=device), Tensor(labels.astype(np.int32), device=device)
    ).numpy()
    np.testing.assert_allclose(got_onehot, want, rtol=1e-5)
    np.testing.assert_allclose(got_int, want, rtol=1e-5)


def test_cross_entropy_grad_matches_torch():
    logits = RNG.standard_normal((6, 4)).astype(np.float32)
    labels = RNG.integers(0, 4, 6)
    onehot = np.eye(4, dtype=np.float32)[labels]
    tx = Tensor(logits.copy(), requires_grad=True)
    nn.CrossEntropyLoss()(tx, Tensor(onehot)).backward()
    xt = torch.tensor(logits, requires_grad=True)
    tF.cross_entropy(xt, torch.tensor(labels)).backward()
    np.testing.assert_allclose(tx.grad.numpy(), xt.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_bce_loss():
    p = RNG.random((5, 1)).astype(np.float32) * 0.9 + 0.05
    y = (RNG.random((5, 1)) > 0.5).astype(np.float32)
    got = nn.BCELoss()(Tensor(p), Tensor(y)).numpy()
    want = tF.binary_cross_entropy(torch.tensor(p), torch.tensor(y)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nll_loss_one_hot():
    logp = np.log(RNG.random((4, 3)).astype(np.float32) + 0.1)
    labels = RNG.integers(0, 3, 4)
    onehot = np.eye(3, dtype=np.float32)[labels]
    got = nn.NLLLoss(reduction="sum")(Tensor(logp), Tensor(onehot)).numpy()
    want = float(-(logp * onehot).sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


# --------------------------------------------------------------- linear
def test_linear_matches_torch(device):
    lin = nn.Linear(5, 3, device=device)
    x = RNG.standard_normal((4, 5)).astype(np.float32)
    w = lin.weight.numpy()  # (in, out) convention
    b = lin.bias.numpy()
    out = lin(Tensor(x, device=device)).numpy()
    np.testing.assert_allclose(out, x @ w + b, rtol=1e-4, atol=1e-5)


def test_linear_grads():
    lin = nn.Linear(4, 2, device="cpu")
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    out = lin(Tensor(x, device="cpu"))
    out.sum().backward()
    np.testing.assert_allclose(
        lin.weight.grad.numpy(), x.T @ np.ones((3, 2), np.float32), rtol=1e-4
    )
    np.testing.assert_allclose(lin.bias.grad.numpy(), np.full((1, 2), 3.0), rtol=1e-5)


# --------------------------------------------------------------- conv / pool
@pytest.mark.parametrize("stride,padding", [(1, 0), (2, 1), (1, 2), (3, 1)])
def test_conv2d_matches_torch(device, stride, padding):
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    got = F.conv2d(Tensor(x, device=device), Tensor(w, device=device), padding, stride).numpy()
    want = tF.conv2d(torch.tensor(x), torch.tensor(w), stride=stride, padding=padding).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_conv2d_groups_matches_torch(device):
    x = RNG.standard_normal((2, 4, 6, 6)).astype(np.float32)
    w = RNG.standard_normal((8, 2, 3, 3)).astype(np.float32)  # groups=2
    got = F.conv2d(Tensor(x, device=device), Tensor(w, device=device), 1, 1, groups=2).numpy()
    want = tF.conv2d(torch.tensor(x), torch.tensor(w), stride=1, padding=1, groups=2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_conv2d_grads_match_torch(device):
    x = RNG.standard_normal((2, 3, 6, 6)).astype(np.float32)
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    tx = Tensor(x.copy(), device=device, requires_grad=True)
    tw = Tensor(w.copy(), device=device, requires_grad=True)
    (F.conv2d(tx, tw, 1, 2) * 1.0).sum().backward()
    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    tF.conv2d(xt, wt, stride=2, padding=1).sum().backward()
    np.testing.assert_allclose(tx.grad.numpy(), xt.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(tw.grad.numpy(), wt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_conv2d_overlap_grad_correct(device):
    """stride < kernel ⇒ overlapping windows; the reference's col2im
    overwrote instead of accumulating (`functional.py:285-294`)."""
    x = RNG.standard_normal((1, 1, 5, 5)).astype(np.float32)
    w = RNG.standard_normal((1, 1, 3, 3)).astype(np.float32)
    tx = Tensor(x.copy(), device=device, requires_grad=True)
    F.conv2d(tx, Tensor(w, device=device), 0, 1).sum().backward()
    xt = torch.tensor(x, requires_grad=True)
    tF.conv2d(xt, torch.tensor(w)).sum().backward()
    np.testing.assert_allclose(tx.grad.numpy(), xt.grad.numpy(), rtol=1e-3, atol=1e-5)


def test_conv1d_matches_torch(device):
    x = RNG.standard_normal((2, 3, 10)).astype(np.float32)
    w = RNG.standard_normal((5, 3, 3)).astype(np.float32)
    got = F.conv1d(Tensor(x, device=device), Tensor(w, device=device), 1, 2).numpy()
    want = tF.conv1d(torch.tensor(x), torch.tensor(w), stride=2, padding=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (3, 2, 1), (2, 1, 0)])
def test_max_pool2d_matches_torch(device, k, s, p):
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    got = F.max_pool2d(Tensor(x, device=device), k, s, p).numpy()
    want = tF.max_pool2d(torch.tensor(x), k, stride=s, padding=p).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_max_pool2d_grad_matches_torch(device):
    x = RNG.standard_normal((1, 2, 6, 6)).astype(np.float32)
    tx = Tensor(x.copy(), device=device, requires_grad=True)
    (F.max_pool2d(tx, 2, 2) * 2.0).sum().backward()
    xt = torch.tensor(x, requires_grad=True)
    (tF.max_pool2d(xt, 2) * 2.0).sum().backward()
    np.testing.assert_allclose(tx.grad.numpy(), xt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_avg_pool2d_matches_torch(device):
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    got = F.avg_pool2d(Tensor(x, device=device), 2, 2).numpy()
    want = tF.avg_pool2d(torch.tensor(x), 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    tx = Tensor(x.copy(), device=device, requires_grad=True)
    F.avg_pool2d(tx, 2, 2).sum().backward()
    np.testing.assert_allclose(
        tx.grad.numpy(), np.full_like(x, 0.25), rtol=1e-5
    )


def test_pool1d(device):
    x = RNG.standard_normal((2, 3, 12)).astype(np.float32)
    got = F.max_pool1d(Tensor(x, device=device), 2, 2).numpy()
    want = tF.max_pool1d(torch.tensor(x), 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got = F.avg_pool1d(Tensor(x, device=device), 3, 3).numpy()
    want = tF.avg_pool1d(torch.tensor(x), 3).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_adaptive_avg_pool_gap(device):
    x = RNG.standard_normal((2, 3, 4, 4)).astype(np.float32)
    got = F.adaptive_avg_pool2d(Tensor(x, device=device), 1).numpy()
    np.testing.assert_allclose(got, x.mean(axis=(2, 3), keepdims=True), rtol=1e-5)


# --------------------------------------------------------------- batchnorm
def test_batchnorm2d_train_matches_torch(device):
    x = RNG.standard_normal((4, 3, 5, 5)).astype(np.float32)
    bn = nn.BatchNorm2d(3, device=device)
    bnt = torch.nn.BatchNorm2d(3)
    bnt.train()
    got = bn(Tensor(x, device=device)).numpy()
    want = bnt(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # running stats updated identically (biased var in EMA? torch uses
    # unbiased for running_var — allow tolerance on that known difference)
    np.testing.assert_allclose(
        bn.running_mean.numpy().ravel(), bnt.running_mean.numpy(), rtol=1e-3, atol=1e-5
    )


def test_batchnorm2d_eval_uses_running_stats(device):
    bn = nn.BatchNorm2d(2, device=device)
    x = RNG.standard_normal((8, 2, 4, 4)).astype(np.float32) * 3 + 1
    bn(Tensor(x, device=device))  # one train step updates stats
    bn.eval()
    y = bn(Tensor(x, device=device)).numpy()
    rm = bn.running_mean.numpy()
    rv = bn.running_var.numpy()
    want = (x - rm) / np.sqrt(rv + bn.eps)
    np.testing.assert_allclose(y, want, rtol=1e-3, atol=1e-4)
    df.set_grad_enabled(True)


def test_batchnorm_buffers_registered():
    bn = nn.BatchNorm2d(4, device="cpu")
    names = dict(bn.named_buffers())
    assert "running_mean" in names and "running_var" in names
    sd = bn.state_dict()
    assert "running_mean" in sd  # the reference dropped BN stats on save


def test_batchnorm_grads():
    x = RNG.standard_normal((4, 2, 3, 3)).astype(np.float32)
    bn = nn.BatchNorm2d(2, device="cpu")
    bnt = torch.nn.BatchNorm2d(2)
    tx = Tensor(x.copy(), device="cpu", requires_grad=True)
    (bn(tx) ** 2.0).sum().backward()
    xt = torch.tensor(x, requires_grad=True)
    (bnt(xt) ** 2).sum().backward()
    np.testing.assert_allclose(tx.grad.numpy(), xt.grad.numpy(), rtol=1e-2, atol=1e-3)


# --------------------------------------------------------------- dropout
def test_dropout_train_eval(device):
    drop = nn.Dropout(0.5)
    x = Tensor(np.ones((100, 100), np.float32), device=device)
    y = drop(x).numpy()
    kept = y != 0
    assert 0.3 < kept.mean() < 0.7
    np.testing.assert_allclose(y[kept], 2.0, rtol=1e-5)  # inverted scaling
    drop.eval()
    y = drop(x).numpy()
    np.testing.assert_allclose(y, 1.0)  # identity in eval (divergence fix)
    df.set_grad_enabled(True)


# --------------------------------------------------------------- module tree
class TinyNet(nn.Module):
    def __init__(self, device="cpu"):
        super().__init__()
        self.fc1 = nn.Linear(4, 8, device=device)
        self.act = nn.ReLU()
        self.fc2 = nn.Linear(8, 2, device=device)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


def test_module_registration_and_traversal():
    net = TinyNet()
    names = [n for n, _ in net.named_parameters()]
    assert names == ["fc1.weight", "fc1.bias", "fc2.weight", "fc2.bias"]
    assert len(list(net.modules())) == 4
    assert [n for n, _ in net.named_children()] == ["fc1", "act", "fc2"]
    assert net.get_submodule("fc1") is net.fc1
    assert net.get_parameter("fc2.weight") is net.fc2.weight


def test_train_eval_flips_global_grad_flag():
    net = TinyNet()
    net.eval()
    assert not df.is_grad_enable()
    assert not net.training
    net.train()
    assert df.is_grad_enable()
    assert net.training


def test_state_dict_roundtrip():
    net, net2 = TinyNet(), TinyNet()
    sd = net.state_dict()
    net2.load_state_dict(sd)
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    np.testing.assert_allclose(
        net(Tensor(x)).numpy(), net2(Tensor(x)).numpy(), rtol=1e-5
    )


def test_load_state_dict_strict_errors():
    net = TinyNet()
    sd = net.state_dict()
    sd["bogus"] = np.zeros(3)
    with pytest.raises(KeyError):
        net.load_state_dict(sd, strict=True)
    net.load_weights(sd)  # non-strict OK


def test_sequential_and_modulelist():
    seq = nn.Sequential(nn.Linear(4, 8, device="cpu"), nn.ReLU(), nn.Linear(8, 2, device="cpu"))
    assert len(seq) == 3
    x = Tensor(RNG.standard_normal((2, 4)).astype(np.float32), device="cpu")
    assert seq(x).shape == (2, 2)
    assert len(list(seq.parameters())) == 4
    ml = nn.ModuleList([nn.Linear(2, 2, device="cpu") for _ in range(3)])
    assert len(ml) == 3
    assert len(list(ml.parameters())) == 6
    ml.append(nn.Linear(2, 2, device="cpu"))
    assert len(ml) == 4
    md = nn.ModuleDict({"a": nn.Linear(2, 2, device="cpu")})
    assert "a" in md and len(list(md.parameters())) == 2


def test_module_move_devices():
    net = TinyNet(device="cpu")
    net.to("tpu")
    assert net.fc1.weight.device.name == "tpu"
    x = Tensor(RNG.standard_normal((2, 4)).astype(np.float32), device="tpu")
    assert net(x).device.name == "tpu"
    net.cpu()
    assert net.fc1.weight.device.name == "cpu"


def test_requires_grad_freezing():
    net = TinyNet()
    net.requires_grad_(False)
    assert all(not p.requires_grad for p in net.parameters())
    net.fc2.requires_grad_(True)
    trainable = [n for n, p in net.named_parameters() if p.requires_grad]
    assert trainable == ["fc2.weight", "fc2.bias"]


def test_zero_grad():
    net = TinyNet()
    x = Tensor(RNG.standard_normal((2, 4)).astype(np.float32))
    net(x).sum().backward()
    assert net.fc1.weight.grad is not None
    net.zero_grad()
    assert net.fc1.weight.grad is None


def test_batchnorm_affine_grads_fused(device):
    """The fused _BatchNormOp must route dgamma/dbeta correctly (it is one
    tape node with three parents)."""
    x = RNG.standard_normal((4, 2, 3, 3)).astype(np.float32)
    bn = nn.BatchNorm2d(2, device=device)
    bnt = torch.nn.BatchNorm2d(2)
    tx = Tensor(x.copy(), device=device, requires_grad=True)
    (bn(tx) * Tensor(x, device=device)).sum().backward()
    xt = torch.tensor(x, requires_grad=True)
    (bnt(xt) * torch.tensor(x)).sum().backward()
    np.testing.assert_allclose(tx.grad.numpy(), xt.grad.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(
        bn.weight.grad.numpy().ravel(),
        bnt.weight.grad.numpy(),
        rtol=1e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        bn.bias.grad.numpy().ravel(), bnt.bias.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_batchnorm_eval_fast_path_constant(device):
    """Eval-mode BN under no-grad takes the fused kernel and must not grow
    the tape."""
    from deepflows_tpu import Graph

    bn = nn.BatchNorm2d(2, device=device)
    x = RNG.standard_normal((4, 2, 3, 3)).astype(np.float32)
    bn(Tensor(x, device=device))
    bn.eval()  # flips global grad off (reference semantics)
    n0 = len(Graph.node_list)
    y = bn(Tensor(x, device=device))
    assert not y.requires_grad
    assert len(Graph.node_list) == n0
    df.set_grad_enabled(True)


def test_fused_cross_entropy_grads_match_torch(device):
    """The fused _SoftmaxXentOp (one tape node) must match torch for both
    reductions, int and one-hot targets, incl. the logits gradient."""
    logits = RNG.standard_normal((6, 5)).astype(np.float32)
    labels = RNG.integers(0, 5, 6)
    for reduction in ("mean", "sum"):
        for tgt in (labels.astype(np.int32), np.eye(5, dtype=np.float32)[labels]):
            t = Tensor(logits.copy(), device=device, requires_grad=True)
            loss = nn.functional.cross_entropy(
                t, Tensor(tgt, device=device), reduction=reduction
            )
            from deepflows_tpu.nn.functional import _SoftmaxXentOp

            assert isinstance(loss, _SoftmaxXentOp)  # fused path engaged
            loss.backward()
            lt = torch.tensor(logits, requires_grad=True)
            tl = torch.nn.functional.cross_entropy(
                lt, torch.tensor(labels, dtype=torch.long), reduction=reduction
            )
            tl.backward()
            np.testing.assert_allclose(
                float(loss.numpy()), float(tl.detach()), rtol=1e-5, atol=1e-6
            )
            np.testing.assert_allclose(
                t.grad.numpy(), lt.grad.numpy(), rtol=1e-4, atol=1e-6
            )


def test_relu6_matches_torch():
    import torch

    # avoid the exact kinks (0, 6): our min/max splits tie-gradients while
    # torch returns 0 there — both valid subgradients
    x = (np.linspace(-3, 9, 25) + 0.01).astype(np.float32)
    xt = df.Tensor(x.copy(), device="tpu", requires_grad=True)
    out = nn.functional.relu6(xt)
    out.sum().backward()
    tx = torch.tensor(x, requires_grad=True)
    tout = torch.nn.functional.relu6(tx)
    tout.sum().backward()
    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-6)


# ---------------------------------------------------------- ignore_index
def test_cross_entropy_ignore_index_matches_torch():
    """ignore_index semantics vs torch: zero loss at ignored positions,
    'mean' divides by the non-ignored count — 2-D fast path and the
    (B, L, V) sequence path, plus gradients."""
    import torch

    rng = np.random.default_rng(4)
    logits = rng.standard_normal((6, 5)).astype(np.float32)
    tgt = np.array([1, -100, 3, -100, 0, 2])

    x = Tensor(logits.copy(), device="tpu", requires_grad=True)
    loss = F.cross_entropy(x, tgt, ignore_index=-100)
    loss.backward()

    tx = torch.tensor(logits, requires_grad=True)
    tl = torch.nn.functional.cross_entropy(
        tx, torch.tensor(tgt), ignore_index=-100
    )
    tl.backward()
    np.testing.assert_allclose(float(loss.numpy()), float(tl), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(x.grad.array), tx.grad.numpy(), rtol=1e-4, atol=1e-6
    )

    # sequence path (B, L, V) + reduction none: zeros at ignored positions
    seq = rng.standard_normal((2, 4, 5)).astype(np.float32)
    stgt = np.array([[1, 2, -1, 3], [-1, -1, 0, 4]])
    sx = Tensor(seq.copy(), device="tpu")
    per = F.cross_entropy(sx, stgt, reduction="none", ignore_index=-1)
    per = np.asarray(per.data.array)
    assert per.shape == (2, 4)
    np.testing.assert_allclose(per[0, 2], 0.0, atol=1e-7)
    np.testing.assert_allclose(per[1, :2], 0.0, atol=1e-7)
    mean = float(F.cross_entropy(sx, stgt, ignore_index=-1).numpy())
    want = torch.nn.functional.cross_entropy(
        torch.tensor(seq).reshape(8, 5), torch.tensor(stgt).reshape(8),
        ignore_index=-1,
    )
    np.testing.assert_allclose(mean, float(want), rtol=1e-5)


def test_cross_entropy_ignore_index_in_compiled_step():
    """The valid count is a traced scalar inside CompiledTrainStep — an
    LM step with prompt-masked targets trains, and masking the prompt
    changes the loss vs unmasked."""
    from deepflows_tpu import models, optim
    from deepflows_tpu.jit import CompiledTrainStep

    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=16, max_len=8, dim=32, depth=1,
                              num_heads=2, device="tpu")
    opt = optim.Adam(lm.parameters(), lr=1e-3)
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss(ignore_index=-1))
    rng = np.random.default_rng(0)
    x = rng.integers(0, 16, (4, 8)).astype(np.int64)
    y = rng.integers(0, 16, (4, 8)).astype(np.int64)
    y[:, :4] = -1  # mask the "prompt" half
    l1 = float(step(x, y))
    l2 = float(step(x, y))
    assert np.isfinite(l1) and l2 < l1 + 1e-3

    # all-ignored batch: loss is exactly 0 (divide-by-count clamps at 1)
    y_all = np.full_like(y, -1)
    l0 = float(step(x, y_all))
    assert l0 == 0.0


def test_cross_entropy_label_smoothing_matches_torch():
    """label_smoothing semantics vs torch (2-D fast path + gradients),
    and combined with ignore_index (ignored rows stay exactly zero)."""
    import torch

    rng = np.random.default_rng(9)
    logits = rng.standard_normal((6, 5)).astype(np.float32)
    tgt = np.array([1, 4, 3, 0, 0, 2])

    x = Tensor(logits.copy(), device="tpu", requires_grad=True)
    loss = F.cross_entropy(x, tgt, label_smoothing=0.1)
    loss.backward()
    tx = torch.tensor(logits, requires_grad=True)
    tl = torch.nn.functional.cross_entropy(
        tx, torch.tensor(tgt), label_smoothing=0.1
    )
    tl.backward()
    np.testing.assert_allclose(float(loss.numpy()), float(tl), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(x.grad.array), tx.grad.numpy(), rtol=1e-4, atol=1e-6
    )

    tgt2 = np.array([1, -100, 3, -100, 0, 2])
    ours = float(F.cross_entropy(
        Tensor(logits.copy(), device="tpu"), tgt2,
        ignore_index=-100, label_smoothing=0.1,
    ).numpy())
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(tgt2),
        ignore_index=-100, label_smoothing=0.1,
    )
    np.testing.assert_allclose(ours, float(want), rtol=1e-5)

    # sequence path (B, L, V)
    seq = rng.standard_normal((2, 4, 5)).astype(np.float32)
    stgt = rng.integers(0, 5, (2, 4))
    ours = float(F.cross_entropy(
        Tensor(seq.copy(), device="tpu"), stgt, label_smoothing=0.2
    ).numpy())
    want = torch.nn.functional.cross_entropy(
        torch.tensor(seq).reshape(8, 5), torch.tensor(stgt).reshape(8),
        label_smoothing=0.2,
    )
    np.testing.assert_allclose(ours, float(want), rtol=1e-5)


def test_topk_accuracy():
    from deepflows_tpu.utils import topk_accuracy

    logits = np.array([
        [5.0, 4.0, 3.0, 0.0],   # top-2 = {0, 1}
        [0.0, 1.0, 2.0, 3.0],   # top-2 = {2, 3}
        [9.0, 0.0, 8.0, 7.0],   # top-2 = {0, 2}
    ])
    y = np.array([1, 0, 2])
    assert topk_accuracy(logits, y, k=1) == 0.0
    assert topk_accuracy(logits, y, k=2) == 2.0
    assert topk_accuracy(logits, y, k=4) == 3.0
    one_hot = np.eye(4)[y]
    assert topk_accuracy(logits, one_hot, k=2) == 2.0
