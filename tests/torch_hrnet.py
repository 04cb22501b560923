"""Official-layout HRNet classification (featmaps) network in plain torch.

Serves as the numerical ORACLE for the Flax HRNet + weight converter: the
module graph and state_dict key naming follow the public
HRNet-Image-Classification ``cls_hrnet.py`` (the network MeshTransformer
vendors as ``hrnet_cls_net_featmaps`` for METRO's HRNet-w64 backbone,
reference scripts/inference_bodymesh.py:228-293). Written from the public
architecture description — torch-only, CPU-only; importing this module must
not initialise a JAX backend.
"""

from __future__ import annotations

import torch
from torch import nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class HighResolutionModule(nn.Module):
    def __init__(self, num_branches, num_blocks, num_channels):
        super().__init__()
        self.num_branches = num_branches
        self.branches = nn.ModuleList([
            nn.Sequential(*[BasicBlock(num_channels[b], num_channels[b])
                            for _ in range(num_blocks)])
            for b in range(num_branches)])
        fuse_layers = []
        for i in range(num_branches):
            layer = []
            for j in range(num_branches):
                if j > i:
                    layer.append(nn.Sequential(
                        nn.Conv2d(num_channels[j], num_channels[i], 1, 1, 0,
                                  bias=False),
                        nn.BatchNorm2d(num_channels[i]),
                        nn.Upsample(scale_factor=2 ** (j - i),
                                    mode="nearest")))
                elif j == i:
                    layer.append(None)
                else:
                    convs = []
                    for k in range(i - j):
                        if k == i - j - 1:
                            convs.append(nn.Sequential(
                                nn.Conv2d(num_channels[j], num_channels[i],
                                          3, 2, 1, bias=False),
                                nn.BatchNorm2d(num_channels[i])))
                        else:
                            convs.append(nn.Sequential(
                                nn.Conv2d(num_channels[j], num_channels[j],
                                          3, 2, 1, bias=False),
                                nn.BatchNorm2d(num_channels[j]),
                                nn.ReLU(inplace=True)))
                    layer.append(nn.Sequential(*convs))
            fuse_layers.append(nn.ModuleList(layer))
        self.fuse_layers = nn.ModuleList(fuse_layers)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        x = [branch(xi) for branch, xi in zip(self.branches, x)]
        out = []
        for i in range(self.num_branches):
            y = x[0] if i == 0 else self.fuse_layers[i][0](x[0])
            for j in range(1, self.num_branches):
                if i == j:
                    y = y + x[j]
                else:
                    y = y + self.fuse_layers[i][j](x[j])
            out.append(self.relu(y))
        return out


def _transition(pre_channels, cur_channels):
    layers = []
    n_pre, n_cur = len(pre_channels), len(cur_channels)
    for i in range(n_cur):
        if i < n_pre:
            if pre_channels[i] != cur_channels[i]:
                layers.append(nn.Sequential(
                    nn.Conv2d(pre_channels[i], cur_channels[i], 3, 1, 1,
                              bias=False),
                    nn.BatchNorm2d(cur_channels[i]),
                    nn.ReLU(inplace=True)))
            else:
                layers.append(None)
        else:
            convs = []
            for j in range(i + 1 - n_pre):
                inc = pre_channels[-1]
                outc = cur_channels[i] if j == i - n_pre else inc
                convs.append(nn.Sequential(
                    nn.Conv2d(inc, outc, 3, 2, 1, bias=False),
                    nn.BatchNorm2d(outc),
                    nn.ReLU(inplace=True)))
            layers.append(nn.Sequential(*convs))
    return nn.ModuleList(layers)


class TorchHRNetFeatmaps(nn.Module):
    """cls_hrnet featmaps variant: returns the 2048-d /32 aggregated grid
    feature and the /4 highest-resolution branch."""

    def __init__(self, width=64, modules=(1, 4, 3)):
        super().__init__()
        w = width
        chans = (w, 2 * w, 4 * w, 8 * w)
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)

        down = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False),
                             nn.BatchNorm2d(256))
        self.layer1 = nn.Sequential(
            Bottleneck(64, 64, downsample=down),
            *[Bottleneck(256, 64) for _ in range(3)])

        self.transition1 = _transition((256,), chans[:2])
        self.stage2 = nn.Sequential(*[
            HighResolutionModule(2, 4, chans[:2]) for _ in range(modules[0])])
        self.transition2 = _transition(chans[:2], chans[:3])
        self.stage3 = nn.Sequential(*[
            HighResolutionModule(3, 4, chans[:3]) for _ in range(modules[1])])
        self.transition3 = _transition(chans[:3], chans[:4])
        self.stage4 = nn.Sequential(*[
            HighResolutionModule(4, 4, chans[:4]) for _ in range(modules[2])])

        head_planes = (32, 64, 128, 256)
        self.incre_modules = nn.ModuleList([
            nn.Sequential(Bottleneck(
                chans[i], head_planes[i],
                downsample=nn.Sequential(
                    nn.Conv2d(chans[i], head_planes[i] * 4, 1, bias=False),
                    nn.BatchNorm2d(head_planes[i] * 4))))
            for i in range(4)])
        self.downsamp_modules = nn.ModuleList([
            nn.Sequential(
                nn.Conv2d(head_planes[i] * 4, head_planes[i + 1] * 4,
                          3, 2, 1, bias=True),
                nn.BatchNorm2d(head_planes[i + 1] * 4),
                nn.ReLU(inplace=True))
            for i in range(3)])
        self.final_layer = nn.Sequential(
            nn.Conv2d(head_planes[3] * 4, 2048, 1, bias=True),
            nn.BatchNorm2d(2048),
            nn.ReLU(inplace=True))

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)

        xs = [self.transition1[0](x), self.transition1[1](x)]
        xs = self.stage2(xs)
        xs = xs + [self.transition2[2](xs[-1])]
        xs = self.stage3(xs)
        xs = xs + [self.transition3[3](xs[-1])]
        xs = self.stage4(xs)

        y = self.incre_modules[0](xs[0])
        for i in range(3):
            y = self.incre_modules[i + 1](xs[i + 1]) \
                + self.downsamp_modules[i](y)
        y = self.final_layer(y)
        return y, xs[0]


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Random weights AND random BN running stats (so conversion mistakes
    in the stats path cannot hide behind zero-mean/unit-var inits)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] \
                    * m.weight.shape[3]
                m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                               * (1.0 / fan_in) ** 0.5)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=g)
                                 * 0.05)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(0.5 + torch.rand(m.num_features, generator=g))
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.num_features, generator=g) * 0.2)
                m.running_var.copy_(
                    0.5 + torch.rand(m.num_features, generator=g))
