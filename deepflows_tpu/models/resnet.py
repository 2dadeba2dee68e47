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


# -------------------------------------------------------------- norm-free
# BN-free (NF-ResNet-style) residual blocks: BENCH_NOTES' ResNet50
# accounting measured BatchNorm at 37% of the memory-bound train step
# (per-activation normalization traffic), with MFU 0.274 -> 0.430 when BN
# is ablated.  These blocks recover BN's optimization benefits without its
# activation traffic: scaled weight standardization (nn.WSConv2d — a
# per-WEIGHT cost), scaled ReLUs (x -> relu(x) * gamma preserves unit
# variance), and analytically variance-tracked residuals
# h_{i+1} = h_i + alpha * f(h_i / beta_i), beta_i = sqrt(Var h_i),
# Var h_{i+1} = Var h_i + alpha^2 (reset at transitions).  Brock et al.
# 2021; no reference analog.

_GAMMA = nn.WSConv2d.GAMMA_RELU


def ws3x3(in_planes, out_planes, stride=1, device=None):
    return nn.WSConv2d(
        in_planes, out_planes, 3, stride=stride, padding=1, bias=False,
        device=device,
    )


def ws1x1(in_planes, out_planes, stride=1, device=None):
    return nn.WSConv2d(
        in_planes, out_planes, 1, stride=stride, padding=0, bias=False,
        device=device,
    )


class NFBasicBlock(nn.Module):
    expansion = 1

    def __init__(
        self, inplanes, planes, stride=1, downsample=None, device=None,
        remat=False, beta=1.0, alpha=0.2,
    ):
        super().__init__()
        self.conv1 = ws3x3(inplanes, planes, stride, device=device)
        self.conv2 = ws3x3(planes, planes, device=device)
        self.relu = nn.ReLU()
        self.downsample = downsample
        self.stride = stride
        self.beta = float(beta)
        self.alpha = float(alpha)
        self._remat = remat

    def forward(self, x):
        if self._remat:
            return nn.remat_call(self, x, self._forward_impl)
        return self._forward_impl(x)

    def _forward_impl(self, x):
        # pre-activation on the variance-normalized input; the transition
        # shortcut consumes the SAME activated tensor (NF-ResNet layout)
        out = self.relu(x * (1.0 / self.beta)) * _GAMMA
        identity = x if self.downsample is None else self.downsample(out)
        out = self.conv1(out)
        out = self.relu(out) * _GAMMA
        out = self.conv2(out)
        return identity + out * self.alpha


class NFBottleneck(nn.Module):
    expansion = 4

    def __init__(
        self, inplanes, planes, stride=1, downsample=None, device=None,
        remat=False, beta=1.0, alpha=0.2,
    ):
        super().__init__()
        self.conv1 = ws1x1(inplanes, planes, device=device)
        self.conv2 = ws3x3(planes, planes, stride, device=device)
        self.conv3 = ws1x1(planes, planes * self.expansion, device=device)
        self.relu = nn.ReLU()
        self.downsample = downsample
        self.stride = stride
        self.beta = float(beta)
        self.alpha = float(alpha)
        self._remat = remat

    def forward(self, x):
        if self._remat:
            return nn.remat_call(self, x, self._forward_impl)
        return self._forward_impl(x)

    def _forward_impl(self, x):
        out = self.relu(x * (1.0 / self.beta)) * _GAMMA
        identity = x if self.downsample is None else self.downsample(out)
        out = self.conv1(out)
        out = self.relu(out) * _GAMMA
        out = self.conv2(out)
        out = self.relu(out) * _GAMMA
        out = self.conv3(out)
        return identity + out * self.alpha


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
        norm="batch",
        alpha=0.2,
    ):
        """``small_input=True`` swaps the 7×7-s2 stem + maxpool for a 3×3-s1
        stem — the CIFAR-style adaptation the reference's transfer-learning
        script performs by hand (`test/ResNet_CIFAR10_transfer_learning.py:196-206`).
        ``remat=True`` rematerialises each residual block in backward
        (nn.Remat — only the block inputs stay resident between forward and
        backward; trades recompute FLOPs for HBM traffic/capacity).

        ``norm="free"`` builds the BN-free NF-ResNet variant (WSConv2d +
        scaled activations + variance-tracked residuals, residual scale
        ``alpha``): same conv FLOPs, none of BatchNorm's per-activation
        normalization traffic — the architectural throughput lever the
        ResNet50 step-time accounting identified (BENCH_NOTES; BN = 37% of
        the memory-bound step).  Checkpoints are NOT interchangeable with
        the ``norm="batch"`` torchvision layout.
        """
        super().__init__()
        if norm not in ("batch", "free"):
            raise ValueError(f"norm must be 'batch' or 'free', got {norm!r}")
        self.inplanes = 64
        self._device = device
        self._block_remat = remat
        self._norm = norm
        self._alpha = float(alpha)
        self._expected_var = 1.0
        if norm == "free":
            block = {BasicBlock: NFBasicBlock, Bottleneck: NFBottleneck}.get(
                block, block
            )
        stem_conv = nn.WSConv2d if norm == "free" else nn.Conv2d
        if small_input:
            self.conv1 = stem_conv(
                in_channels, 64, 3, stride=1, padding=1, bias=False, device=device
            )
            self.maxpool = None
        else:
            self.conv1 = stem_conv(
                in_channels, 64, 7, stride=2, padding=3, bias=False, device=device
            )
            self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        if norm == "batch":
            self.bn1 = nn.BatchNorm2d(64, device=device)
        self.relu = nn.ReLU()
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * block.expansion, num_classes, device=device)

    def _make_layer(self, block, planes, blocks, stride=1):
        if self._norm == "free":
            return self._make_layer_free(block, planes, blocks, stride)
        return self._make_layer_batch(block, planes, blocks, stride)

    def _make_layer_free(self, block, planes, blocks, stride=1):
        layers = []
        for i in range(blocks):
            s = stride if i == 0 else 1
            transition = s != 1 or self.inplanes != planes * block.expansion
            downsample = (
                ws1x1(
                    self.inplanes, planes * block.expansion, s,
                    device=self._device,
                )
                if transition
                else None
            )
            layers.append(
                block(
                    self.inplanes, planes, s, downsample,
                    device=self._device, remat=self._block_remat,
                    beta=self._expected_var ** 0.5, alpha=self._alpha,
                )
            )
            self.inplanes = planes * block.expansion
            # the branch adds alpha^2 of variance; a transition's shortcut
            # is a conv of the unit-variance activation, resetting the base
            self._expected_var = (
                1.0 if transition else self._expected_var
            ) + self._alpha**2
        return nn.Sequential(*layers)

    def _make_layer_batch(self, block, planes, blocks, stride=1):
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
        if self._norm == "free":
            # stem conv only — NF blocks activate their own (normalized)
            # inputs; a final activation feeds the pooled head
            x = self.conv1(x)
            if self.maxpool is not None:
                x = self.maxpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.relu(x)
        else:
            x = self.relu(self.bn1(self.conv1(x)))
            if self.maxpool is not None:
                x = self.maxpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        x = x.reshape(x.shape[0], -1)
        return self.fc(x)


def ResNet18(
    num_classes=1000, in_channels=3, small_input=False, device=None,
    remat=False, norm="batch",
):
    return ResNet(
        BasicBlock, [2, 2, 2, 2], num_classes, in_channels, small_input, device,
        remat, norm,
    )


def ResNet34(
    num_classes=1000, in_channels=3, small_input=False, device=None,
    remat=False, norm="batch",
):
    return ResNet(
        BasicBlock, [3, 4, 6, 3], num_classes, in_channels, small_input, device,
        remat, norm,
    )


def ResNet50(
    num_classes=1000, in_channels=3, small_input=False, device=None,
    remat=False, norm="batch",
):
    return ResNet(
        Bottleneck, [3, 4, 6, 3], num_classes, in_channels, small_input, device,
        remat, norm,
    )
