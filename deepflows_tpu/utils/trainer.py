"""High-level Trainer (the reference shipped a dead `utils/train_metric.py`
with broken imports, SURVEY §2.6 — this is the working equivalent, built on
the compiled whole-step path)."""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from ..jit import CompiledEvalStep, CompiledTrainStep
from .data import data_loader
from .evaluate import Accumulator


class Trainer:
    """Compiled-step training loop with eval, early stop, checkpointing and
    per-epoch timing.

    >>> trainer = Trainer(model, optimizer, criterion, scheduler=sch)
    >>> history = trainer.fit(x_train, y_train, x_test, y_test,
    ...                       epochs=10, batch_size=64)
    """

    def __init__(
        self,
        model,
        optimizer,
        criterion,
        scheduler=None,
        augment_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        checkpoint_path: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        step=None,
        eval_step=None,
    ):
        """``step``/``eval_step`` inject pre-built step objects — e.g. a
        ``parallel.ShardedTrainStep``/``ShardedEvalStep`` pair to run the
        same high-level loop data/tensor-parallel over a mesh; defaults are
        the single-chip compiled steps."""
        self.model = model
        self.optimizer = optimizer
        self.criterion = criterion
        self.scheduler = scheduler
        self.augment_fn = augment_fn
        self.checkpoint_path = checkpoint_path
        self.log = log_fn
        self.step = step or CompiledTrainStep(model, optimizer, criterion)
        self.eval_step = eval_step or CompiledEvalStep(model)
        self.history = {"loss": [], "test_acc": [], "epoch_time": [], "lr": []}

    def evaluate(self, x, y, batch_size=256) -> float:
        import jax

        metric = Accumulator(2)
        batches = list(data_loader(x, y, batch_size))
        # dispatch all eval steps, then ONE host readback (per-batch
        # np.asarray pays a device round-trip per batch)
        outs = jax.device_get([self.eval_step(xb) for xb, _ in batches])
        for logits, (_, yb) in zip(outs, batches):
            pred = np.asarray(logits).argmax(1)
            metric.add(float((pred == yb).sum()), len(yb))
        return metric[0] / max(metric[1], 1)

    def fit(
        self,
        x_train,
        y_train,
        x_test=None,
        y_test=None,
        epochs: int = 10,
        batch_size: int = 64,
        shuffle: bool = True,
        target_acc: Optional[float] = None,
        eval_batch_size: int = 256,
        prefetch_size: int = 2,
        stage_on_device: bool = True,
    ) -> dict:
        # Augmentation runs inside the loader's collate_fn — i.e. on the
        # prefetch thread, off the critical path — and staged batches ride
        # their H2D transfer under the previous step's compute.
        augment = self.augment_fn
        collate = (
            (lambda batch: (augment(batch[0]), batch[1])) if augment else None
        )
        # mesh-parallel steps declare batch in_shardings; a batch pre-staged
        # onto ONE device would conflict with the committed mesh layout —
        # let the jitted step shard host arrays itself in that case
        if hasattr(self.step, "mesh"):
            stage_on_device = False
        for epoch in range(epochs):
            t0 = time.time()
            losses = []
            for xb, yb in data_loader(
                x_train,
                y_train,
                batch_size,
                shuffle=shuffle,
                drop_last=True,
                prefetch_size=prefetch_size,
                collate_fn=collate,
                device=True if stage_on_device else None,
            ):
                losses.append(self.step(xb, yb))
            if self.scheduler is not None:
                self.scheduler.step()
            import jax

            # one transfer for all per-step losses (not one RTT per step)
            loss = float(np.mean(jax.device_get(losses)))
            dt = time.time() - t0
            acc = (
                self.evaluate(x_test, y_test, eval_batch_size)
                if x_test is not None
                else float("nan")
            )
            self.history["loss"].append(loss)
            self.history["test_acc"].append(acc)
            self.history["epoch_time"].append(dt)
            self.history["lr"].append(self.optimizer.lr)
            self.log(
                f"epoch {epoch}: loss={loss:.4f} test_acc={acc:.4f} time={dt:.2f}s"
            )
            if self.checkpoint_path:
                from .model_utils import save_checkpoint

                save_checkpoint(
                    self.model, self.optimizer, epoch, loss, self.checkpoint_path
                )
            if target_acc is not None and acc * 100.0 >= target_acc:
                self.log(f"early stop at target accuracy {target_acc}%")
                break
        return self.history
