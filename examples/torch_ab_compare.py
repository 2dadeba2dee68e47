"""Cross-framework A/B comparison (reference:
`test/CNN_Dishes_cuda_gpu_monitor.py` + `test/CNN_Dishes_torch_gpu_monitor.py`
train the same CNN in DeepFlows vs PyTorch with matched hyperparameters).

Trains the same CNN with the same init, same data order and matched Adam
hyperparameters in deepflows_tpu (compiled TPU path) and torch (CPU), then
compares loss trajectories and wall-clock per epoch.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import torch
import torch.nn as tnn

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.utils.pretrained_models import export_torch_state_dict

from common import get_cifar10


class TorchTwin(tnn.Module):
    """torch twin of models.CIFAR10_CNN (same module names/shapes)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 32, 5, padding=2)
        self.bn1 = tnn.BatchNorm2d(32)
        self.conv2 = tnn.Conv2d(32, 64, 5, padding=2)
        self.bn2 = tnn.BatchNorm2d(64)
        self.conv3 = tnn.Conv2d(64, 128, 3, padding=1)
        self.bn3 = tnn.BatchNorm2d(128)
        self.pool = tnn.MaxPool2d(2, 2)
        self.relu = tnn.ReLU()
        self.drop = tnn.Dropout(0.5)
        self.fc = tnn.Linear(128 * 4 * 4, num_classes)

    def forward(self, x):
        x = self.pool(self.relu(self.bn1(self.conv1(x))))
        x = self.pool(self.relu(self.bn2(self.conv2(x))))
        x = self.pool(self.relu(self.bn3(self.conv3(x))))
        x = x.flatten(1)
        return self.fc(self.drop(x))


def main(epochs=2, batch_size=64, lr=1e-3, limit=2048):
    df.manual_seed(0)
    x_train, y_train, *_ = get_cifar10(limit=limit)
    n_batches = len(x_train) // batch_size

    ours = models.CIFAR10_CNN(device="tpu")
    twin = TorchTwin()
    # identical initialization: export ours in torch layout
    twin.load_state_dict(
        {k: torch.tensor(v) for k, v in export_torch_state_dict(ours).items()},
        strict=False,
    )

    opt = optim.Adam(ours.parameters(), lr=lr)
    step = CompiledTrainStep(ours, opt, nn.CrossEntropyLoss())
    topt = torch.optim.Adam(twin.parameters(), lr=lr)
    tcrit = tnn.CrossEntropyLoss()

    print(f"{'epoch':>5} {'ours_loss':>10} {'torch_loss':>10} {'ours_s':>8} {'torch_s':>8}")
    for epoch in range(epochs):
        t0 = time.time()
        ours_losses = []
        for b in range(n_batches):
            xb = x_train[b * batch_size : (b + 1) * batch_size]
            yb = y_train[b * batch_size : (b + 1) * batch_size]
            ours_losses.append(step(xb, yb))
        ours_loss = float(np.mean([float(l) for l in ours_losses]))
        ours_t = time.time() - t0

        t0 = time.time()
        torch_losses = []
        for b in range(n_batches):
            xb = torch.tensor(x_train[b * batch_size : (b + 1) * batch_size])
            yb = torch.tensor(
                y_train[b * batch_size : (b + 1) * batch_size], dtype=torch.long
            )
            out = twin(xb)
            loss = tcrit(out, yb)
            topt.zero_grad()
            loss.backward()
            topt.step()
            torch_losses.append(float(loss.detach()))
        torch_loss = float(np.mean(torch_losses))
        torch_t = time.time() - t0
        print(
            f"{epoch:>5} {ours_loss:>10.4f} {torch_loss:>10.4f} "
            f"{ours_t:>8.2f} {torch_t:>8.2f}"
        )
    gap = abs(ours_loss - torch_loss) / max(torch_loss, 1e-8)
    print(f"final-epoch loss gap: {100 * gap:.1f}% (dropout streams differ)")
    return ours_loss, torch_loss


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--limit", type=int, default=2048)
    args = p.parse_args()
    main(args.epochs, args.batch_size, limit=args.limit)
