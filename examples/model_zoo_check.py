"""Model-zoo shape check (reference: `test/MobileNet.py:262`
``test_output_shape`` and `test/VGG.py`): instantiate every zoo model,
run a forward pass, print parameter counts and output shapes."""

from __future__ import annotations

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import Tensor, models


def main(device="tpu"):
    df.manual_seed(0)
    zoo = [
        ("MLP", models.MLP(device=device), (2, 784)),
        ("MNIST_CNN", models.MNIST_CNN(device=device), (2, 1, 28, 28)),
        ("CIFAR10_CNN", models.CIFAR10_CNN(device=device), (2, 3, 32, 32)),
        ("DishesCNN", models.DishesCNN(img_size=64, device=device), (2, 3, 64, 64)),
        ("ResNet18", models.ResNet18(num_classes=10, small_input=True, device=device), (2, 3, 32, 32)),
        ("ResNet50", models.ResNet50(num_classes=10, small_input=True, device=device), (1, 3, 32, 32)),
        ("MobileNetV1", models.MobileNetV1(num_classes=10, device=device), (1, 3, 64, 64)),
        ("MobileNetV2", models.MobileNetV2(num_classes=10, device=device), (1, 3, 64, 64)),
        ("VGG16", models.VGG16(num_classes=10, batch_norm=True, img_size=32, device=device), (1, 3, 32, 32)),
    ]
    print(f"{'model':>12} {'params':>12} {'out shape':>12}")
    for name, model, in_shape in zoo:
        n_params = sum(p.size for p in model.parameters())
        x = Tensor(np.zeros(in_shape, np.float32), device=device)
        out = model(x)
        print(f"{name:>12} {n_params:>12,} {str(out.shape):>12}")
        df.Graph.free_graph_all()


if __name__ == "__main__":
    main()
