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
    def __init__(
        self, inp, oup, kernel_size=3, stride=1, groups=1, device=None,
        act="relu",
    ):
        super().__init__()
        padding = (kernel_size - 1) // 2
        self.conv = nn.Conv2d(
            inp, oup, kernel_size, stride, padding, groups=groups, bias=False,
            device=device,
        )
        self.bn = nn.BatchNorm2d(oup, device=device)
        self.relu = nn.ReLU6() if act == "relu6" else nn.ReLU()

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


# ---------------------------------------------------------------- V2
class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (expand 1x1 -> depthwise 3x3 ->
    project 1x1, residual when stride 1 and shapes match).  No reference
    analog (the reference stops at V1); torchvision-compatible layout."""

    def __init__(self, inp, oup, stride, expand_ratio, device=None):
        super().__init__()
        hidden = int(round(inp * expand_ratio))
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU(inp, hidden, 1, device=device, act="relu6"))
        layers.append(
            ConvBNReLU(
                hidden, hidden, 3, stride, groups=hidden, device=device,
                act="relu6",
            )
        )
        # linear projection (no activation)
        layers.append(
            nn.Conv2d(hidden, oup, 1, 1, 0, bias=False, device=device)
        )
        layers.append(nn.BatchNorm2d(oup, device=device))
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


class MobileNetV2(nn.Module):
    """MobileNetV2 (torchvision-compatible inverted-residual settings)."""

    _SETTINGS = [
        # t, c, n, s
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    ]

    def __init__(
        self, num_classes=1000, width_multiplier=1.0, in_channels=3,
        small_input=False, device=None,
    ):
        super().__init__()
        wm = width_multiplier
        c = make_divisible(32 * wm)
        stem_stride = 1 if small_input else 2
        features = [
            ConvBNReLU(in_channels, c, 3, stem_stride, device=device, act="relu6")
        ]
        for t, ch, n, s in self._SETTINGS:
            out_c = make_divisible(ch * wm)
            for i in range(n):
                features.append(
                    InvertedResidual(
                        c, out_c, s if i == 0 else 1, t, device=device
                    )
                )
                c = out_c
        last = make_divisible(1280 * max(1.0, wm))
        features.append(ConvBNReLU(c, last, 1, device=device, act="relu6"))
        self.features = nn.Sequential(*features)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2),
            nn.Linear(last, num_classes, device=device),
        )

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        x = x.reshape(x.shape[0], -1)
        return self.classifier(x)
