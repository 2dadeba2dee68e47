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

from common import get_cifar10
from torch_twins import TorchCIFAR10CNN, load_from_deepflows

# see examples/parity_trajectory.py for the FULL reference-recipe A/B with
# per-epoch state re-sync and committed tables (docs/TRAJECTORY_AB_*.md)


def main(epochs=2, batch_size=64, lr=1e-3, limit=2048):
    df.manual_seed(0)
    x_train, y_train, *_ = get_cifar10(limit=limit)
    n_batches = len(x_train) // batch_size

    ours = models.CIFAR10_CNN(device="tpu")
    # identical initialization: export ours in torch layout
    twin = load_from_deepflows(TorchCIFAR10CNN(), ours)

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
