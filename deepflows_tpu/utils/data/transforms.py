"""Data augmentation transforms.

The reference implements augmentation inline per script: random horizontal
flip (`test/CNN_CIFAR10_cuda.py:133-134`), crop/flip/erase in the transfer
script (`test/ResNet_CIFAR10_transfer_learning.py:145-174`), and per-channel
standardization (`test/CNN_CIFAR10_cuda.py:37-40`).  This module packages
them as composable batch transforms over NCHW numpy arrays (host-side, fed
to the compiled step)."""

from __future__ import annotations

import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            x = t(x)
        return x


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5, seed=None):
        self.p = p
        self._rng = np.random.default_rng(seed)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        flip = self._rng.random(len(x)) < self.p
        x = x.copy()
        x[flip] = x[flip][..., ::-1]
        return x


class RandomCrop:
    """Pad-then-random-crop (the CIFAR-standard 32→pad4→crop32)."""

    def __init__(self, size: int, padding: int = 4, seed=None):
        self.size = size
        self.padding = padding
        self._rng = np.random.default_rng(seed)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        n, c, h, w = x.shape
        p = self.padding
        xp = np.pad(x, ((0, 0), (0, 0), (p, p), (p, p)))
        out = np.empty((n, c, self.size, self.size), dtype=x.dtype)
        ys = self._rng.integers(0, h + 2 * p - self.size + 1, n)
        xs = self._rng.integers(0, w + 2 * p - self.size + 1, n)
        for i in range(n):
            out[i] = xp[i, :, ys[i] : ys[i] + self.size, xs[i] : xs[i] + self.size]
        return out


class RandomErasing:
    """Zero a random rectangle per image with probability p."""

    def __init__(self, p: float = 0.5, scale=(0.02, 0.2), seed=None):
        self.p = p
        self.scale = scale
        self._rng = np.random.default_rng(seed)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        n, c, h, w = x.shape
        x = x.copy()
        for i in range(n):
            if self._rng.random() >= self.p:
                continue
            area = self._rng.uniform(*self.scale) * h * w
            side = max(1, int(np.sqrt(area)))
            eh, ew = min(side, h), min(side, w)
            y0 = self._rng.integers(0, h - eh + 1)
            x0 = self._rng.integers(0, w - ew + 1)
            x[i, :, y0 : y0 + eh, x0 : x0 + ew] = 0.0
        return x


class Normalize:
    """Per-channel (x - mean) / std over NCHW."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32).reshape(1, -1, 1, 1)
        self.std = np.asarray(std, dtype=np.float32).reshape(1, -1, 1, 1)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / self.std
