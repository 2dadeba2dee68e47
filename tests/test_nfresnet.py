"""BN-free (NF-style) ResNet variant: ``models.ResNet*(norm="free")``.

The r5 ResNet50 step-time accounting (BENCH_NOTES) measured BatchNorm at
37% of the memory-bound train step; ``norm="free"`` is the shipped
architectural lever: nn.WSConv2d (scaled weight standardization), scaled
ReLUs, and analytically variance-tracked residuals (Brock et al. 2021).
No reference analog (the reference has only BatchNorm2d,
`DeepFlows/nn/modules/batchnorm.py`)."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep

DEV = "cpu"


def _data(n=64, c=3, hw=12, classes=10, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, n)
    x = rng.normal(size=(n, c, hw, hw)).astype(np.float32)
    x += y[:, None, None, None].astype(np.float32) * 0.3
    return x, y


def test_ws_conv_standardizes_and_learns_gain():
    conv = nn.WSConv2d(3, 8, 3, padding=1, bias=False, device=DEV)
    w = conv.standardized_weight().numpy()
    fan_in = 3 * 9
    assert np.abs(w.mean(axis=(1, 2, 3))).max() < 1e-6
    # unit gain -> var * fan_in == gamma^2 (default gamma 1.0)
    assert np.allclose(w.var(axis=(1, 2, 3)) * fan_in, 1.0, atol=1e-2)
    x = df.Tensor(np.random.randn(2, 3, 8, 8).astype(np.float32), device=DEV)
    out = conv(x).sum()
    out.backward()
    assert conv.gain.grad is not None and conv.weight.grad is not None


def test_nf_resnet_has_no_batchnorm_and_forwards():
    m = models.ResNet18(num_classes=10, small_input=True, norm="free",
                        device=DEV)
    assert not any(
        isinstance(mm, nn.BatchNorm2d) for _, mm in m.named_modules()
    )
    assert any(
        isinstance(mm, nn.WSConv2d) for _, mm in m.named_modules()
    )
    x = df.Tensor(np.random.randn(2, 3, 16, 16).astype(np.float32),
                  device=DEV)
    y = m(x)
    assert y.shape == (2, 10)
    assert np.isfinite(y.numpy()).all()


def test_nf_bottleneck_signal_propagation():
    # deep 50-layer stack at init must neither explode nor die: logits of
    # the 224-style stem model stay finite with sane scale
    m = models.ResNet50(num_classes=10, norm="free", device=DEV)
    x = df.Tensor(np.random.randn(2, 3, 64, 64).astype(np.float32),
                  device=DEV)
    y = m(x).numpy()
    assert np.isfinite(y).all()
    assert 1e-3 < np.abs(y).mean() < 1e3


def test_nf_resnet_trains_compiled():
    df.manual_seed(0)
    m = models.ResNet18(num_classes=10, small_input=True, norm="free",
                        device=DEV)
    step = CompiledTrainStep(
        m, optim.Adam(m.parameters(), lr=1e-3), nn.CrossEntropyLoss()
    )
    x, y = _data()
    losses = [float(step(x, y)) for _ in range(10)]
    assert losses[-1] < losses[0] * 0.8, losses


def test_nf_matches_batch_variant_trainability():
    # same data, same budget: the BN-free variant's loss decrease is in
    # the same league as BatchNorm's (the BN benefits WS+variance-tracking
    # are meant to recover)
    x, y = _data()

    def run(norm):
        df.manual_seed(0)
        m = models.ResNet18(num_classes=10, small_input=True, norm=norm,
                            device=DEV)
        step = CompiledTrainStep(
            m, optim.Adam(m.parameters(), lr=1e-3), nn.CrossEntropyLoss()
        )
        return [float(step(x, y)) for _ in range(10)]

    free, batch = run("free"), run("batch")
    drop_free = free[0] - free[-1]
    drop_batch = batch[0] - batch[-1]
    assert drop_free > 0.3 * drop_batch, (free, batch)


def test_nf_resnet_bf16_mixed_precision_step():
    import jax.numpy as jnp

    df.manual_seed(0)
    m = models.ResNet18(num_classes=10, small_input=True, norm="free",
                        device=DEV)
    step = CompiledTrainStep(
        m, optim.Adam(m.parameters(), lr=1e-3), nn.CrossEntropyLoss(),
        compute_dtype=jnp.bfloat16,
    )
    x, y = _data(n=32)
    losses = [float(step(x, y)) for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_nf_resnet_state_dict_roundtrip():
    m = models.ResNet18(num_classes=10, small_input=True, norm="free",
                        device=DEV)
    sd = m.state_dict()
    assert any(k.endswith("gain") for k in sd)
    m2 = models.ResNet18(num_classes=10, small_input=True, norm="free",
                         device=DEV)
    m2.load_state_dict(sd)
    x = df.Tensor(np.random.randn(2, 3, 16, 16).astype(np.float32),
                  device=DEV)
    np.testing.assert_allclose(m(x).numpy(), m2(x).numpy(), rtol=1e-6)


def test_nf_norm_validation():
    with pytest.raises(ValueError):
        models.ResNet18(norm="group", device=DEV)
