"""CIFAR-10 CNN workload (reference: `test/CNN_CIFAR10_cuda.py`).

Same config: CIFAR10_CNN, Adam lr .005 wd 5e-4, CosineAnnealing LR, bs 64,
random horizontal-flip augmentation, early stop at target accuracy,
checkpoint save — on the compiled whole-step TPU path (reference accuracy
baseline: 69.14% @ 10 epochs, BASELINE.md)."""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep
from deepflows_tpu.utils import save_checkpoint
from deepflows_tpu.utils.data import data_loader

from common import EpochTimer, eval_accuracy, get_cifar10, mean_loss, random_flip


def main(
    data_dir=None,
    epochs=10,
    batch_size=64,
    lr=5e-3,
    weight_decay=5e-4,
    target_acc=85.0,
    device="tpu",
    checkpoint_path=None,
    limit=None,
    bf16=False,
):
    df.manual_seed(0)
    x_train, y_train, x_test, y_test = get_cifar10(data_dir, limit=limit)
    print(f"train={x_train.shape} test={x_test.shape}")

    model = models.CIFAR10_CNN(device=device)
    optimizer = optim.Adam(model.parameters(), lr=lr, weight_decay=weight_decay)
    scheduler = optim.CosineAnnealingLR(optimizer, T_max=epochs)
    compute_dtype = None
    if bf16:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    step = CompiledTrainStep(
        model, optimizer, nn.CrossEntropyLoss(), compute_dtype=compute_dtype
    )
    eval_step = CompiledEvalStep(model)

    rng = np.random.default_rng(0)
    timer = EpochTimer()
    best_acc = 0.0
    for epoch in range(epochs):
        losses = []
        # flip augmentation runs on the prefetch thread; batches are staged
        # onto the chip one step ahead (H2D overlaps compute)
        loader = data_loader(
            x_train,
            y_train,
            batch_size,
            shuffle=True,
            drop_last=True,
            prefetch_size=2,
            collate_fn=lambda b: (random_flip(b[0], rng), b[1]),
            device=True,
        )
        for xb, yb in loader:
            losses.append(step(xb, yb))
        scheduler.step()

        acc = eval_accuracy(eval_step, x_test, y_test, batch_size)
        best_acc = max(best_acc, acc)
        epoch_loss = mean_loss(losses)
        timer.epoch_done(epoch, loss=epoch_loss, test_acc=acc)
        if checkpoint_path:
            save_checkpoint(model, optimizer, epoch, epoch_loss, checkpoint_path)
        if acc >= target_acc:
            print(f"early stop: reached target accuracy {target_acc}%")
            break
    timer.total()
    print(f"best test accuracy: {best_acc:.2f}%")
    return best_acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None, help="dir with CIFAR-10 python batches")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--target-acc", type=float, default=85.0)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()
    main(
        args.data_dir,
        args.epochs,
        args.batch_size,
        target_acc=args.target_acc,
        checkpoint_path=args.checkpoint,
        limit=args.limit,
        bf16=args.bf16,
    )
