"""Workload CNN/MLP models from the reference's test scripts, as library
models (the reference keeps them inline in scripts; SURVEY §2.8)."""

from __future__ import annotations

from .. import nn
from ..nn import functional as F


class MLP(nn.Module):
    """784→100→20→10 ReLU MLP (reference `test/MLP_MNIST.py:72-80`)."""

    def __init__(self, in_features=784, hidden=(100, 20), num_classes=10, device=None):
        super().__init__()
        dims = [in_features, *hidden, num_classes]
        self.layers = nn.ModuleList(
            [nn.Linear(a, b, device=device) for a, b in zip(dims[:-1], dims[1:])]
        )

    def forward(self, x):
        if x.ndim > 2:
            x = x.flatten(1)
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


class MNIST_CNN(nn.Module):
    """conv5(1→32)-pool-conv5(32→64)-pool-fc
    (reference `test/CNN_MNIST_cuda.py:75-81`)."""

    def __init__(self, num_classes=10, device=None):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 32, kernel_size=5, padding=2, device=device)
        self.relu1 = nn.ReLU()
        self.pool1 = nn.MaxPool2d(kernel_size=2, stride=2)
        self.conv2 = nn.Conv2d(32, 64, kernel_size=5, padding=2, device=device)
        self.relu2 = nn.ReLU()
        self.pool2 = nn.MaxPool2d(kernel_size=2, stride=2)
        self.fc = nn.Linear(64 * 7 * 7, num_classes, device=device)

    def forward(self, x):
        x = self.pool1(self.relu1(self.conv1(x)))
        x = self.pool2(self.relu2(self.conv2(x)))
        x = x.reshape(x.shape[0], -1)
        return self.fc(x)


class CIFAR10_CNN(nn.Module):
    """3-block conv5/conv5/conv3 + BN + dropout + fc CNN for 3×32×32 inputs
    (reference `test/CNN_CIFAR10_cuda.py:61-108`)."""

    def __init__(self, num_classes=10, device=None):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, kernel_size=5, padding=2, device=device)
        self.bn1 = nn.BatchNorm2d(32, device=device)
        self.relu1 = nn.ReLU()
        self.pool1 = nn.MaxPool2d(kernel_size=2, stride=2)

        self.conv2 = nn.Conv2d(32, 64, kernel_size=5, padding=2, device=device)
        self.bn2 = nn.BatchNorm2d(64, device=device)
        self.relu2 = nn.ReLU()
        self.pool2 = nn.MaxPool2d(kernel_size=2, stride=2)

        self.conv3 = nn.Conv2d(64, 128, kernel_size=3, padding=1, device=device)
        self.bn3 = nn.BatchNorm2d(128, device=device)
        self.relu3 = nn.ReLU()
        self.pool3 = nn.MaxPool2d(kernel_size=2, stride=2)

        self.drop = nn.Dropout(0.5)
        self.fc = nn.Linear(128 * 4 * 4, num_classes, device=device)

    def forward(self, x):
        x = self.pool1(self.relu1(self.bn1(self.conv1(x))))
        x = self.pool2(self.relu2(self.bn2(self.conv2(x))))
        x = self.pool3(self.relu3(self.bn3(self.conv3(x))))
        x = x.reshape(x.shape[0], -1)
        x = self.drop(x)
        return self.fc(x)


class DishesCNN(nn.Module):
    """CNN(3→64→128→256)+dropout for the Dishes workload
    (reference `test/CNN_Dishes_cuda.py`, mirrored at
    `test/CNN_Dishes_torch_gpu_monitor.py:82-103`)."""

    def __init__(self, num_classes=10, img_size=64, device=None):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 3, padding=1, device=device),
            nn.BatchNorm2d(64, device=device),
            nn.ReLU(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, padding=1, device=device),
            nn.BatchNorm2d(128, device=device),
            nn.ReLU(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 256, 3, padding=1, device=device),
            nn.BatchNorm2d(256, device=device),
            nn.ReLU(),
            nn.MaxPool2d(2, 2),
        )
        feat = img_size // 8
        self.classifier = nn.Sequential(
            nn.Dropout(0.5),
            nn.Linear(256 * feat * feat, 512, device=device),
            nn.ReLU(),
            nn.Dropout(0.5),
            nn.Linear(512, num_classes, device=device),
        )

    def forward(self, x):
        x = self.features(x)
        x = x.reshape(x.shape[0], -1)
        return self.classifier(x)
