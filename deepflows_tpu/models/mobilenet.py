"""MobileNetV1 with TRUE depthwise-separable convolutions (via Conv2d groups,
which this framework supports; the reference had no groups and substituted
plain convs — `test/MobileNet.py:18-36` "简化的卷积块，替代深度可分离卷积")."""

from __future__ import annotations

from .. import nn
from ..utils.model_configs import MOBILENET_V1_CONFIG


def make_divisible(v, divisor=8, min_value=None):
    """Width-multiplier channel rounding (reference `test/MobileNet.py:38-46`)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU(nn.Module):
    def __init__(self, inp, oup, kernel_size=3, stride=1, groups=1, device=None):
        super().__init__()
        padding = (kernel_size - 1) // 2
        self.conv = nn.Conv2d(
            inp, oup, kernel_size, stride, padding, groups=groups, bias=False,
            device=device,
        )
        self.bn = nn.BatchNorm2d(oup, device=device)
        self.relu = nn.ReLU()

    def forward(self, x):
        return self.relu(self.bn(self.conv(x)))


class DepthwiseSeparable(nn.Module):
    def __init__(self, inp, oup, stride, device=None):
        super().__init__()
        self.depthwise = ConvBNReLU(inp, inp, 3, stride, groups=inp, device=device)
        self.pointwise = ConvBNReLU(inp, oup, 1, 1, device=device)

    def forward(self, x):
        return self.pointwise(self.depthwise(x))


class MobileNetV1(nn.Module):
    def __init__(self, num_classes=1000, width_multiplier=1.0, in_channels=3, device=None):
        super().__init__()
        wm = width_multiplier
        c_stem = make_divisible(32 * wm)
        layers = [ConvBNReLU(in_channels, c_stem, 3, 2, device=device)]
        c_in = c_stem
        for c_out, stride in MOBILENET_V1_CONFIG["blocks"]:
            c = make_divisible(c_out * wm)
            layers.append(DepthwiseSeparable(c_in, c, stride, device=device))
            c_in = c
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(c_in, num_classes, device=device)

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        x = x.reshape(x.shape[0], -1)
        return self.fc(x)
