"""Hand-written PyTorch twins of the framework's models, with matching
module names so ``export_torch_state_dict(ours)`` loads directly
(`strict=True`).  Used by the A/B parity harnesses (the reference's own
cross-framework methodology: `test/CNN_Dishes_torch_gpu_monitor.py`).

torchvision is unavailable in this environment, so the ResNet18 twin is
written out by hand following the same BasicBlock topology as
`deepflows_tpu/models/resnet.py` (itself torchvision-name-compatible).
"""

from __future__ import annotations

import torch
import torch.nn as tnn


class TorchCIFAR10CNN(tnn.Module):
    """Twin of `deepflows_tpu.models.CIFAR10_CNN` (reference
    `test/CNN_CIFAR10_cuda.py:61-108`)."""

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


class _TorchBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(tnn.Module):
    """Twin of `deepflows_tpu.models.ResNet18(small_input=...)`."""

    def __init__(self, num_classes=10, small_input=True, in_channels=3):
        super().__init__()
        self.inplanes = 64
        if small_input:
            self.conv1 = tnn.Conv2d(in_channels, 64, 3, 1, 1, bias=False)
            self.maxpool = None
        else:
            self.conv1 = tnn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.layer1 = self._make_layer(64, 2)
        self.layer2 = self._make_layer(128, 2, stride=2)
        self.layer3 = self._make_layer(256, 2, stride=2)
        self.layer4 = self._make_layer(512, 2, stride=2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )
        layers = [_TorchBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers += [_TorchBasicBlock(planes, planes) for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        if self.maxpool is not None:
            x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def load_from_deepflows(twin: tnn.Module, df_model, strict=True):
    """Copy a deepflows_tpu model's params/buffers into its torch twin."""
    from deepflows_tpu.utils.pretrained_models import export_torch_state_dict

    sd = {k: torch.tensor(v) for k, v in export_torch_state_dict(df_model).items()}
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    # num_batches_tracked buffers are torch-only; everything else must match
    real_missing = [m for m in missing if not m.endswith("num_batches_tracked")]
    if strict and (real_missing or unexpected):
        raise RuntimeError(f"state_dict mismatch: missing={real_missing} "
                           f"unexpected={unexpected}")
    return twin


class TorchDishesCNN(tnn.Module):
    """Twin of `deepflows_tpu.models.DishesCNN` (reference
    `test/CNN_Dishes_cuda.py`, mirrored at
    `test/CNN_Dishes_torch_gpu_monitor.py:82-103`) — identical Sequential
    slot indices so state_dicts map 1:1."""

    def __init__(self, num_classes=10, img_size=64):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, padding=1),
            tnn.BatchNorm2d(64),
            tnn.ReLU(),
            tnn.MaxPool2d(2, 2),
            tnn.Conv2d(64, 128, 3, padding=1),
            tnn.BatchNorm2d(128),
            tnn.ReLU(),
            tnn.MaxPool2d(2, 2),
            tnn.Conv2d(128, 256, 3, padding=1),
            tnn.BatchNorm2d(256),
            tnn.ReLU(),
            tnn.MaxPool2d(2, 2),
        )
        feat = img_size // 8
        self.classifier = tnn.Sequential(
            tnn.Dropout(0.5),
            tnn.Linear(256 * feat * feat, 512),
            tnn.ReLU(),
            tnn.Dropout(0.5),
            tnn.Linear(512, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = x.flatten(1)
        return self.classifier(x)


class TorchMLP(tnn.Module):
    """Twin of models.MLP (784→100→20→10 ReLU; reference
    `test/MLP_MNIST.py:72-80`) — module names match for state_dict load."""

    def __init__(self, in_features=784, hidden=(100, 20), num_classes=10):
        super().__init__()
        dims = [in_features, *hidden, num_classes]
        self.layers = tnn.ModuleList(
            [tnn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])]
        )

    def forward(self, x):
        if x.dim() > 2:
            x = x.flatten(1)
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = torch.relu(x)
        return x


class TorchMNISTCNN(tnn.Module):
    """Twin of models.MNIST_CNN (reference `test/CNN_MNIST_cuda.py:75-81`)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(1, 32, kernel_size=5, padding=2)
        self.conv2 = tnn.Conv2d(32, 64, kernel_size=5, padding=2)
        self.fc = tnn.Linear(64 * 7 * 7, num_classes)

    def forward(self, x):
        x = torch.max_pool2d(torch.relu(self.conv1(x)), 2, 2)
        x = torch.max_pool2d(torch.relu(self.conv2(x)), 2, 2)
        return self.fc(x.reshape(x.shape[0], -1))
