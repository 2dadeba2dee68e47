"""Image-folder loading helpers (reference: `DeepFlows/utils/data/pre.py`)."""

from __future__ import annotations

import os

import numpy as np


def read_png_images_from_folder(folder, size=None):
    """Load all images in a directory into a list of HWC uint8 arrays."""
    from PIL import Image

    images = []
    for fname in sorted(os.listdir(folder)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        img = Image.open(os.path.join(folder, fname)).convert("RGB")
        if size is not None:
            img = img.resize(size)
        images.append(np.asarray(img))
    return images


def load_image_folder(root, size=(64, 64), dtype=np.float32):
    """Per-class-subdirectory image dataset: returns (X NCHW float, y int32,
    class_names) — covers the reference's per-script Animal/Dishes loaders
    (`test/ResNet.py:157-194`)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    xs, ys = [], []
    for label, cls in enumerate(classes):
        for img in read_png_images_from_folder(os.path.join(root, cls), size=size):
            xs.append(img)
            ys.append(label)
    x = np.stack(xs).astype(dtype) / 255.0
    x = x.transpose(0, 3, 1, 2)  # NHWC -> NCHW
    return x, np.asarray(ys, dtype=np.int32), classes
