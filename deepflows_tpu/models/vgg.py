"""VGG family (reference: `test/VGG.py:7-140`).

``VGG16(batch_norm=False)`` uses torchvision-compatible sequential indices
(features.N / classifier.N) so torch vgg16 state_dicts convert directly;
``batch_norm=True`` matches the reference script's BN variant.
"""

from __future__ import annotations

from .. import nn
from ..utils.model_configs import VGG_CONFIG


class VGG(nn.Module):
    def __init__(
        self,
        cfg,
        num_classes=1000,
        batch_norm=False,
        img_size=224,
        in_channels=3,
        dropout=0.5,
        device=None,
    ):
        super().__init__()
        layers = []
        c_in = in_channels
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(c_in, v, 3, padding=1, device=device))
                if batch_norm:
                    layers.append(nn.BatchNorm2d(v, device=device))
                layers.append(nn.ReLU())
                c_in = v
        self.features = nn.Sequential(*layers)
        feat = img_size // 32
        self.avgpool = nn.AdaptiveAvgPool2d(feat if feat <= 7 else 7)
        feat = min(feat, 7)
        self.classifier = nn.Sequential(
            nn.Linear(512 * feat * feat, 4096, device=device),
            nn.ReLU(),
            nn.Dropout(dropout),
            nn.Linear(4096, 4096, device=device),
            nn.ReLU(),
            nn.Dropout(dropout),
            nn.Linear(4096, num_classes, device=device),
        )

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)  # clamps spatial dims for inputs larger than img_size
        x = x.reshape(x.shape[0], -1)
        return self.classifier(x)


def VGG16(num_classes=1000, batch_norm=False, img_size=224, in_channels=3, device=None):
    return VGG(
        VGG_CONFIG["vgg16"],
        num_classes=num_classes,
        batch_norm=batch_norm,
        img_size=img_size,
        in_channels=in_channels,
        device=device,
    )
