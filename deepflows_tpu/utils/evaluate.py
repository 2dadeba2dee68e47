"""Metrics (reference: `DeepFlows/utils/evaluate.py`)."""

from __future__ import annotations

import numpy as np

from ..autograd import no_grad
from ..tensor import Tensor


def softmax(x, axis=-1):
    x = np.asarray(x)
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def accuracy(y_hat, y):
    """Count of correct predictions; accepts logits/one-hot or class indices
    for either argument (reference compares argmax-vs-argmax on one-hot,
    `evaluate.py:35-52`)."""
    if isinstance(y_hat, Tensor):
        y_hat = y_hat.numpy()
    if isinstance(y, Tensor):
        y = y.numpy()
    y_hat = np.asarray(y_hat)
    y = np.asarray(y)
    if y_hat.ndim > 1 and y_hat.shape[-1] > 1:
        y_hat = y_hat.argmax(axis=-1)
    if y.ndim > 1 and y.shape[-1] > 1:
        y = y.argmax(axis=-1)
    return float((y_hat.astype(np.int64) == y.astype(np.int64)).sum())


def topk_accuracy(y_hat, y, k: int = 5):
    """Count of targets appearing in the top-k predictions (the ImageNet
    top-5 convention; no reference analog).  ``y_hat`` is (N, C) logits or
    probabilities, ``y`` integer class indices or one-hot."""
    if isinstance(y_hat, Tensor):
        y_hat = y_hat.numpy()
    if isinstance(y, Tensor):
        y = y.numpy()
    y_hat = np.asarray(y_hat)
    y = np.asarray(y)
    if y.ndim > 1 and y.shape[-1] > 1:
        y = y.argmax(axis=-1)
    if k >= y_hat.shape[-1]:
        return float(len(y))
    topk = np.argpartition(-y_hat, k, axis=-1)[..., :k]
    return float((topk == y.astype(np.int64)[..., None]).any(-1).sum())


@no_grad()
def evaluate_accuracy(model, data_iter, device=None):
    """Mean accuracy of ``model`` over an iterable of (x, y) numpy batches
    (reference `evaluate.py:55-59`)."""
    was_training = getattr(model, "training", False)
    if hasattr(model, "eval"):
        model.eval()
    metric = Accumulator(2)
    dev = device or getattr(model, "device", None)
    for x, y in data_iter:
        out = model(Tensor(x, device=dev))
        metric.add(accuracy(out, y), len(np.asarray(y)))
    if was_training and hasattr(model, "train"):
        model.train()
    return metric[0] / metric[1]


class Accumulator:
    def __init__(self, n):
        self.data = [0.0] * n

    def add(self, *args):
        self.data = [a + float(b) for a, b in zip(self.data, args)]

    def reset(self):
        self.data = [0.0] * len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]
