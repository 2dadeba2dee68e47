"""ViT-Tiny on CIFAR-10 (no reference analog — the reference zoo is
CNN-only; this drives the transformer family end-to-end: AdamW + warmup
cosine, flip augmentation, compiled train/eval steps).

    python vit_cifar10.py --epochs 10 --batch-size 256
"""

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
    batch_size=256,
    lr=1e-3,
    device="tpu",
    limit=None,
    bf16=False,
    remat=False,
):
    df.manual_seed(0)
    x_train, y_train, x_test, y_test = get_cifar10(data_dir, limit=limit)
    model = models.ViT_Tiny(
        image_size=32, patch_size=4, num_classes=10, device=device,
        dropout=0.1, remat=remat,
    )
    optimizer = optim.AdamW(model.parameters(), lr=lr, weight_decay=5e-2)
    scheduler = optim.WarmupCosineLR(
        optimizer, warmup_epochs=2, T_max=max(3, epochs)
    )
    import jax.numpy as jnp

    step = CompiledTrainStep(
        model,
        optimizer,
        nn.CrossEntropyLoss(),
        compute_dtype=jnp.bfloat16 if bf16 else None,
    )
    eval_step = CompiledEvalStep(model)

    rng = np.random.default_rng(0)
    timer = EpochTimer()
    for epoch in range(epochs):
        losses = [
            step(xb, yb)
            for xb, yb in data_loader(
                x_train,
                y_train,
                batch_size,
                shuffle=True,
                drop_last=True,
                collate_fn=lambda b: (random_flip(b[0], rng), b[1]),
            )
        ]
        scheduler.step()
        acc = eval_accuracy(eval_step, x_test, y_test)
        timer.epoch_done(epoch, loss=mean_loss(losses), test_acc=acc, lr=optimizer.lr)
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--device", default="tpu")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()
    main(
        args.data_dir, args.epochs, args.batch_size, args.lr, args.device,
        args.limit, args.bf16, args.remat,
    )
