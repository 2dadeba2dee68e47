"""ResNet family (reference: `test/ResNet.py:24-154` builds ResNet18 with
blocks in plain Python lists because the reference's ModuleList was a stub).

This implementation uses torchvision-compatible module names (conv1, bn1,
layer1..layer4, fc; block-internal conv1/bn1/conv2/bn2[/conv3/bn3],
downsample.0/downsample.1) so pretrained torch state_dicts convert via the
identity name mapping the reference's pretrained pipeline uses
(`DeepFlows/model_param_mappings/resnet18_complete_mapping.json`).
"""

from __future__ import annotations

from .. import nn


def conv3x3(in_planes, out_planes, stride=1, device=None):
    return nn.Conv2d(
        in_planes, out_planes, 3, stride=stride, padding=1, bias=False, device=device
    )


def conv1x1(in_planes, out_planes, stride=1, device=None):
    return nn.Conv2d(
        in_planes, out_planes, 1, stride=stride, padding=0, bias=False, device=device
    )


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(
        self, inplanes, planes, stride=1, downsample=None, device=None, remat=False
    ):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride, device=device)
        self.bn1 = nn.BatchNorm2d(planes, device=device)
        self.relu = nn.ReLU()
        self.conv2 = conv3x3(planes, planes, device=device)
        self.bn2 = nn.BatchNorm2d(planes, device=device)
        self.downsample = downsample
        self.stride = stride
        self._remat = remat

    def forward(self, x):
        if self._remat:
            return nn.remat_call(self, x, self._forward_impl)
        return self._forward_impl(x)

    def _forward_impl(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(
        self, inplanes, planes, stride=1, downsample=None, device=None, remat=False
    ):
        super().__init__()
        self.conv1 = conv1x1(inplanes, planes, device=device)
        self.bn1 = nn.BatchNorm2d(planes, device=device)
        self.conv2 = conv3x3(planes, planes, stride, device=device)
        self.bn2 = nn.BatchNorm2d(planes, device=device)
        self.conv3 = conv1x1(planes, planes * self.expansion, device=device)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion, device=device)
        self.relu = nn.ReLU()
        self.downsample = downsample
        self.stride = stride
        self._remat = remat

    def forward(self, x):
        if self._remat:
            return nn.remat_call(self, x, self._forward_impl)
        return self._forward_impl(x)

    def _forward_impl(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


# alias for reference-script compatibility (`test/ResNet.py:24`)
ResidualBlock = BasicBlock


class ResNet(nn.Module):
    def __init__(
        self,
        block,
        layers,
        num_classes=1000,
        in_channels=3,
        small_input=False,
        device=None,
        remat=False,
    ):
        """``small_input=True`` swaps the 7×7-s2 stem + maxpool for a 3×3-s1
        stem — the CIFAR-style adaptation the reference's transfer-learning
        script performs by hand (`test/ResNet_CIFAR10_transfer_learning.py:196-206`).
        ``remat=True`` rematerialises each residual block in backward
        (nn.Remat — only the block inputs stay resident between forward and
        backward; trades recompute FLOPs for HBM traffic/capacity).
        """
        super().__init__()
        self.inplanes = 64
        self._device = device
        self._block_remat = remat
        if small_input:
            self.conv1 = nn.Conv2d(
                in_channels, 64, 3, stride=1, padding=1, bias=False, device=device
            )
            self.maxpool = None
        else:
            self.conv1 = nn.Conv2d(
                in_channels, 64, 7, stride=2, padding=3, bias=False, device=device
            )
            self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.bn1 = nn.BatchNorm2d(64, device=device)
        self.relu = nn.ReLU()
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * block.expansion, num_classes, device=device)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride, device=self._device),
                nn.BatchNorm2d(planes * block.expansion, device=self._device),
            )
        layers = [
            block(
                self.inplanes,
                planes,
                stride,
                downsample,
                device=self._device,
                remat=self._block_remat,
            )
        ]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(
                block(
                    self.inplanes,
                    planes,
                    device=self._device,
                    remat=self._block_remat,
                )
            )
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        if self.maxpool is not None:
            x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.avgpool(x)
        x = x.reshape(x.shape[0], -1)
        return self.fc(x)


def ResNet18(
    num_classes=1000, in_channels=3, small_input=False, device=None, remat=False
):
    return ResNet(
        BasicBlock, [2, 2, 2, 2], num_classes, in_channels, small_input, device,
        remat,
    )


def ResNet34(
    num_classes=1000, in_channels=3, small_input=False, device=None, remat=False
):
    return ResNet(
        BasicBlock, [3, 4, 6, 3], num_classes, in_channels, small_input, device,
        remat,
    )


def ResNet50(
    num_classes=1000, in_channels=3, small_input=False, device=None, remat=False
):
    return ResNet(
        Bottleneck, [3, 4, 6, 3], num_classes, in_channels, small_input, device,
        remat,
    )
