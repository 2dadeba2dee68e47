"""ResNet18 on CIFAR-10 (reference: `test/ResNet_CIFAR10_cuda.py` /
`test/ResNet.py`): SGD momentum 0.9 + StepLR, small-input stem."""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep
from deepflows_tpu.utils.data import data_loader

from common import EpochTimer, eval_accuracy, get_cifar10, mean_loss, random_flip


def main(
    data_dir=None,
    epochs=10,
    batch_size=128,
    lr=0.1,
    device="tpu",
    target_acc=95.0,
    limit=None,
):
    df.manual_seed(0)
    x_train, y_train, x_test, y_test = get_cifar10(data_dir, limit=limit)
    model = models.ResNet18(num_classes=10, small_input=True, device=device)
    optimizer = optim.SGD(model.parameters(), lr=lr, momentum=0.9, weight_decay=5e-4)
    scheduler = optim.StepLR(optimizer, step_size=5, gamma=0.1)
    step = CompiledTrainStep(model, optimizer, nn.CrossEntropyLoss())
    eval_step = CompiledEvalStep(model)

    rng = np.random.default_rng(0)
    timer = EpochTimer()
    best = 0.0
    for epoch in range(epochs):
        losses = [
            step(xb, yb)
            for xb, yb in data_loader(
                x_train,
                y_train,
                batch_size,
                shuffle=True,
                drop_last=True,
                prefetch_size=2,
                collate_fn=lambda b: (random_flip(b[0], rng), b[1]),
                device=True,
            )
        ]
        scheduler.step()
        acc = eval_accuracy(eval_step, x_test, y_test, batch_size)
        best = max(best, acc)
        timer.epoch_done(epoch, loss=mean_loss(losses), test_acc=acc)
        if acc >= target_acc:
            break
    timer.total()
    print(f"best test accuracy: {best:.2f}%")
    return best


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()
    main(args.data_dir, args.epochs, args.batch_size, limit=args.limit)
