"""Image-folder training workload (reference: `test/CNN_Animal10_cuda.py`,
`test/CNN_Dishes_cuda.py`, `test/ResNet_Animal10_cuda.py`): per-class
subdirectories of images → DishesCNN or ResNet18 training.

Reference accuracy anchors (BASELINE.md): Animal-10 CNN max 45.45%,
Dishes CNN 82.52%.  Without a dataset directory, a synthetic image-folder is
generated so the pipeline still runs end-to-end.
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.utils import Trainer
from deepflows_tpu.utils.data import load_image_folder

from common import random_flip


def make_synthetic_folder(root, num_classes=4, per_class=24, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    xs = np.linspace(0, np.pi * 2, size, dtype=np.float32)
    for k in range(num_classes):
        d = os.path.join(root, f"class_{k}")
        os.makedirs(d, exist_ok=True)
        # flip-invariant pattern (random_flip augmentation stays label-true)
        pattern = (
            np.abs(np.sin((k + 1) * xs))[None, :]
            * np.abs(np.cos((k + 1) * xs))[:, None]
        )
        for i in range(per_class):
            img = pattern * 0.5 + 0.5 + rng.standard_normal((size, size)) * 0.15
            arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(np.stack([arr] * 3, -1), "RGB").save(
                os.path.join(d, f"{i}.png")
            )
    return root


def main(
    data_dir=None,
    model_name="dishes_cnn",
    epochs=30,
    batch_size=32,
    lr=1e-3,
    img_size=64,
    device="tpu",
):
    df.manual_seed(0)
    if data_dir is None:
        data_dir = make_synthetic_folder(tempfile.mkdtemp(), size=img_size)
        print(f"no --data-dir given; generated synthetic folder at {data_dir}")
    x, y, classes = load_image_folder(data_dir, size=(img_size, img_size))
    print(f"loaded {len(x)} images, {len(classes)} classes: {classes}")
    n_test = max(1, len(x) // 5)
    perm = np.random.default_rng(0).permutation(len(x))
    x, y = x[perm], y[perm]
    x_train, y_train = x[:-n_test], y[:-n_test]
    x_test, y_test = x[-n_test:], y[-n_test:]

    if model_name == "resnet18":
        model = models.ResNet18(
            num_classes=len(classes), small_input=img_size <= 64, device=device
        )
        opt = optim.SGD(model.parameters(), lr=0.01, momentum=0.9)
        sch = optim.StepLR(opt, step_size=10, gamma=0.1)
    elif model_name == "mobilenet_v1":
        model = models.MobileNetV1(num_classes=len(classes), device=device)
        opt = optim.Adam(model.parameters(), lr=lr)
        sch = None
    elif model_name == "vgg16":
        model = models.VGG16(
            num_classes=len(classes), batch_norm=True, img_size=img_size, device=device
        )
        opt = optim.SGD(model.parameters(), lr=0.01, momentum=0.9)
        sch = optim.StepLR(opt, step_size=10, gamma=0.1)
    else:
        model = models.DishesCNN(
            num_classes=len(classes), img_size=img_size, device=device
        )
        opt = optim.Adam(model.parameters(), lr=lr, weight_decay=1e-4)
        sch = None

    rng = np.random.default_rng(0)
    trainer = Trainer(
        model, opt, nn.CrossEntropyLoss(), scheduler=sch,
        augment_fn=lambda xb: random_flip(xb, rng),
    )
    hist = trainer.fit(
        x_train, y_train, x_test, y_test,
        epochs=epochs, batch_size=min(batch_size, len(x_train)),
    )
    print(f"final test acc: {hist['test_acc'][-1]:.3f}")
    return hist


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument(
        "--model",
        default="dishes_cnn",
        choices=["dishes_cnn", "resnet18", "mobilenet_v1", "vgg16"],
    )
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=64)
    args = p.parse_args()
    main(args.data_dir, args.model, args.epochs, args.batch_size, img_size=args.img_size)
