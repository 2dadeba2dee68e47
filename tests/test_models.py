"""Model zoo shape/smoke tests (the reference's `test_output_shape` style,
`test/MobileNet.py:262`) plus a short convergence run per family head."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, models, nn, optim

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_mlp_shapes():
    m = models.MLP(device="cpu")
    x = Tensor(RNG.standard_normal((2, 784)).astype(np.float32), device="cpu")
    assert m(x).shape == (2, 10)


def test_mnist_cnn_shapes(device):
    m = models.MNIST_CNN(device=device)
    x = Tensor(RNG.standard_normal((2, 1, 28, 28)).astype(np.float32), device=device)
    assert m(x).shape == (2, 10)


def test_cifar10_cnn_shapes(device):
    m = models.CIFAR10_CNN(device=device)
    x = Tensor(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32), device=device)
    assert m(x).shape == (2, 10)


def test_dishes_cnn_shapes():
    m = models.DishesCNN(num_classes=5, img_size=64, device="tpu")
    x = Tensor(RNG.standard_normal((2, 3, 64, 64)).astype(np.float32), device="tpu")
    assert m(x).shape == (2, 5)


def test_resnet18_shapes():
    m = models.ResNet18(num_classes=10, small_input=True, device="tpu")
    x = Tensor(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32), device="tpu")
    assert m(x).shape == (2, 10)
    # torchvision-compatible parameter names for pretrained conversion
    names = {n for n, _ in m.named_parameters()}
    assert "conv1.weight" in names
    assert "layer1.0.conv1.weight" in names
    assert "layer2.0.downsample.0.weight" in names
    assert "fc.weight" in names


def test_resnet50_shapes():
    m = models.ResNet50(num_classes=7, small_input=True, device="tpu")
    x = Tensor(RNG.standard_normal((1, 3, 32, 32)).astype(np.float32), device="tpu")
    assert m(x).shape == (1, 7)
    names = {n for n, _ in m.named_parameters()}
    assert "layer1.0.conv3.weight" in names  # bottleneck


def test_mobilenet_v1_shapes_and_depthwise():
    m = models.MobileNetV1(num_classes=10, device="tpu")
    x = Tensor(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32), device="tpu")
    assert m(x).shape == (1, 10)
    # true depthwise: first block's depthwise conv has groups == channels
    dw = m.features[1].depthwise.conv
    assert dw.groups == dw.in_channels == dw.out_channels
    assert dw.weight.shape[1] == 1


def test_mobilenet_width_multiplier():
    m = models.MobileNetV1(num_classes=10, width_multiplier=0.5, device="tpu")
    x = Tensor(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32), device="tpu")
    assert m(x).shape == (1, 10)
    assert models.make_divisible(32 * 0.5) == 16


def test_vgg16_shapes():
    m = models.VGG16(num_classes=10, batch_norm=True, img_size=32, device="tpu")
    x = Tensor(RNG.standard_normal((1, 3, 32, 32)).astype(np.float32), device="tpu")
    assert m(x).shape == (1, 10)


def test_resnet18_trains_one_step_compiled():
    from deepflows_tpu.jit import CompiledTrainStep

    m = models.ResNet18(num_classes=3, small_input=True, device="tpu")
    opt = optim.SGD(m.parameters(), lr=0.01, momentum=0.9)
    step = CompiledTrainStep(m, opt, nn.CrossEntropyLoss())
    x = RNG.standard_normal((4, 3, 16, 16)).astype(np.float32)
    y = RNG.integers(0, 3, 4).astype(np.int32)
    l1 = float(step(x, y))
    l2 = float(step(x, y))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1  # same batch twice: loss must drop


def test_mobilenet_v2():
    """MobileNetV2: torchvision-matching parameter count (2,236,682 for 10
    classes — verified against torchvision's formula), forward shape, and a
    compiled training step."""
    from deepflows_tpu.jit import CompiledTrainStep

    df.manual_seed(0)
    m = models.MobileNetV2(num_classes=10, small_input=True, device="tpu")
    n_params = sum(int(np.prod(p.shape)) for p in m.parameters())
    assert n_params == 2_236_682, n_params
    out = m(df.Tensor(np.zeros((2, 3, 32, 32), np.float32), device="tpu"))
    assert out.shape == (2, 10)
    # inverted-residual skip only where stride 1 and channels match
    opt = optim.Adam(m.parameters(), lr=1e-3)
    step = CompiledTrainStep(m, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)
    x = r.standard_normal((4, 3, 32, 32)).astype(np.float32)
    y = r.integers(0, 10, 4).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(3)]
    assert all(np.isfinite(losses))
