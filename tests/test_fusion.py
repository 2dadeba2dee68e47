"""Conv→BatchNorm inference folding: ``nn.fusion.fuse_conv_bn``.

torch-parity surface (torch.nn.utils.fusion.fuse_conv_bn_eval); no
reference analog — the reference's eval BatchNorm pays the full
normalization traffic every forward
(`/root/reference/DeepFlows/nn/modules/batchnorm.py:47-53`).  Pair
discovery is by the framework's own eager tape (producer + consumer
count), so these tests cover both the fold math and the safety rules.
"""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import nn
from deepflows_tpu.nn.fusion import fuse_conv_bn

DEV = "cpu"


def _bn_count(model):
    return sum(
        1
        for _, m in model.named_modules()
        if type(m) in (nn.BatchNorm1d, nn.BatchNorm2d)
    )


def _warm_bn(model, x_shape, steps=3, seed=1):
    """Run a few training forwards so running stats are non-trivial."""
    rng = np.random.default_rng(seed)
    model.train()
    for _ in range(steps):
        x = df.Tensor(
            rng.normal(size=x_shape).astype(np.float32) * 2.0 + 0.5, device=DEV
        )
        model(x)
    model.eval()


def test_resnet18_folds_every_bn_and_matches_eval_forward():
    from deepflows_tpu import models

    df.manual_seed(0)
    model = models.ResNet18(num_classes=10, small_input=True, device=DEV)
    _warm_bn(model, (8, 3, 16, 16))
    x = df.Tensor(
        np.random.default_rng(2).normal(size=(4, 3, 16, 16)).astype(np.float32),
        device=DEV,
    )
    y_ref = model(x).numpy()

    fused = fuse_conv_bn(model, x)
    assert _bn_count(fused) == 0  # every conv in ResNet feeds its BN only
    # folded convs grew a bias (ResNet convs are bias=False)
    convs = [m for _, m in fused.named_modules() if type(m) is nn.Conv2d]
    assert convs and all(c.bias is not None for c in convs)
    y_fused = fused(x).numpy()
    np.testing.assert_allclose(y_fused, y_ref, rtol=2e-4, atol=2e-4)
    # original untouched (inplace=False)
    assert _bn_count(model) > 0
    np.testing.assert_allclose(model(x).numpy(), y_ref, rtol=0, atol=0)


def test_inplace_fuses_the_model_itself():
    model = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1, bias=True, device=DEV),
        nn.BatchNorm2d(8, device=DEV),
        nn.ReLU(),
    )
    _warm_bn(model, (4, 3, 8, 8))
    x = df.Tensor(np.ones((2, 3, 8, 8), np.float32), device=DEV)
    y_ref = model(x).numpy()
    out = fuse_conv_bn(model, x, inplace=True)
    assert out is model and _bn_count(model) == 0
    np.testing.assert_allclose(model(x).numpy(), y_ref, rtol=1e-5, atol=1e-5)


def test_multi_consumer_conv_is_not_folded():
    class Branchy(nn.Module):
        """conv output feeds BOTH the BN and a residual add."""

        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 3, 3, padding=1, device=DEV)
            self.bn = nn.BatchNorm2d(3, device=DEV)

        def forward(self, x):
            h = self.conv(x)
            return self.bn(h) + h  # folding would corrupt the skip path

    model = Branchy()
    _warm_bn(model, (4, 3, 8, 8))
    x = df.Tensor(
        np.random.default_rng(3).normal(size=(2, 3, 8, 8)).astype(np.float32),
        device=DEV,
    )
    y_ref = model(x).numpy()
    fused = fuse_conv_bn(model, x)
    assert _bn_count(fused) == 1  # refused
    np.testing.assert_allclose(fused(x).numpy(), y_ref, rtol=1e-6, atol=1e-6)


def test_shared_conv_called_twice_is_not_folded():
    class Shared(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 3, 3, padding=1, device=DEV)
            self.bn = nn.BatchNorm2d(3, device=DEV)

        def forward(self, x):
            return self.bn(self.conv(self.conv(x)))

    model = Shared()
    _warm_bn(model, (4, 3, 8, 8))
    x = df.Tensor(np.ones((2, 3, 8, 8), np.float32), device=DEV)
    y_ref = model(x).numpy()
    fused = fuse_conv_bn(model, x)
    assert _bn_count(fused) == 1
    np.testing.assert_allclose(fused(x).numpy(), y_ref, rtol=1e-6, atol=1e-6)


def test_linear_bn1d_folds():
    model = nn.Sequential(
        nn.Linear(6, 16, device=DEV),
        nn.BatchNorm1d(16, device=DEV),
        nn.ReLU(),
        nn.Linear(16, 4, device=DEV),
    )
    _warm_bn(model, (8, 6))
    x = df.Tensor(
        np.random.default_rng(4).normal(size=(5, 6)).astype(np.float32), device=DEV
    )
    y_ref = model(x).numpy()
    fused = fuse_conv_bn(model, x)
    assert _bn_count(fused) == 0
    np.testing.assert_allclose(fused(x).numpy(), y_ref, rtol=1e-5, atol=1e-5)


def test_no_running_stats_bn_is_kept():
    model = nn.Sequential(
        nn.Conv2d(3, 4, 3, padding=1, device=DEV),
        nn.BatchNorm2d(4, track_running_stats=False, device=DEV),
    )
    model.eval()
    x = df.Tensor(np.ones((2, 3, 8, 8), np.float32), device=DEV)
    fused = fuse_conv_bn(model, x)
    assert _bn_count(fused) == 1  # batch-stat BN cannot fold


def test_wsconv_is_never_folded():
    """WSConv2d re-standardizes per call — a folded scale would be erased."""
    model = nn.Sequential(
        nn.WSConv2d(3, 4, 3, padding=1, bias=False, device=DEV),
        nn.BatchNorm2d(4, device=DEV),
    )
    _warm_bn(model, (4, 3, 8, 8))
    x = df.Tensor(np.ones((2, 3, 8, 8), np.float32), np.float32, device=DEV)
    y_ref = model(x).numpy()
    fused = fuse_conv_bn(model, x)
    assert _bn_count(fused) == 1
    np.testing.assert_allclose(fused(x).numpy(), y_ref, rtol=1e-6, atol=1e-6)


def test_fused_model_serves_under_jit():
    """The fused graph stays traceable — one jitted predict, BN-free."""
    from deepflows_tpu import models
    from deepflows_tpu.jit import CompiledEvalStep

    df.manual_seed(0)
    model = models.ResNet18(num_classes=10, small_input=True, device=DEV)
    _warm_bn(model, (8, 3, 16, 16))
    x = df.Tensor(np.ones((2, 3, 16, 16), np.float32), device=DEV)
    y_ref = model(x).numpy()
    fused = fuse_conv_bn(model, x)
    pred = CompiledEvalStep(fused)
    got = np.asarray(pred(np.ones((2, 3, 16, 16), np.float32)))
    np.testing.assert_allclose(got, y_ref, rtol=2e-4, atol=2e-4)


def test_fuse_does_not_flip_global_grad_mode():
    """Module.eval() inside fuse_conv_bn flips the process-wide grad flag;
    fusing a snapshot must restore the caller's mode (review regression)."""
    model = nn.Sequential(
        nn.Conv2d(3, 4, 3, padding=1, device=DEV),
        nn.BatchNorm2d(4, device=DEV),
    )
    _warm_bn(model, (4, 3, 8, 8))
    x = df.Tensor(np.ones((2, 3, 8, 8), np.float32), device=DEV)

    df.set_grad_enabled(True)
    fuse_conv_bn(model, x)
    assert df.is_grad_enabled() is True

    df.set_grad_enabled(False)
    try:
        fuse_conv_bn(model, x)
        assert df.is_grad_enabled() is False
    finally:
        df.set_grad_enabled(True)


def test_fuse_preserves_pending_backward_graph():
    """A caller's un-backwarded graph must survive fuse_conv_bn's trace
    cleanup: only the trace's own nodes may be freed (review regression)."""
    df.manual_seed(0)
    live = nn.Linear(4, 3, device=DEV)
    xs = df.Tensor(np.ones((2, 4), np.float32), device=DEV)
    loss = (live(xs) ** 2).sum()  # pending graph, not yet backwarded

    snap = nn.Sequential(
        nn.Conv2d(3, 4, 3, padding=1, device=DEV),
        nn.BatchNorm2d(4, device=DEV),
    )
    _warm_bn(snap, (4, 3, 8, 8))
    fuse_conv_bn(snap, df.Tensor(np.ones((2, 3, 8, 8), np.float32), device=DEV))

    loss.backward()  # edges severed by the old cleanup -> zero/missing grads
    g = live.weight.grad
    assert g is not None and float(np.abs(g.numpy()).max()) > 0.0
