"""From-scratch torch re-instantiation of the reference's smp
``Linknet(encoder_name='efficientnet-b4', classes=1, activation='sigmoid')``
layout (train_image_seg.py:82-89) — the numerical oracle for
vfloodnet_tpu.models.linknet_smp + core.convert.convert_smp_linknet_state_dict.

segmentation_models_pytorch itself is not installed in this environment
(same situation as the empty MeshTransformer submodule — see
tests/torch_metro.py), so the layout is re-built here from the smp /
efficientnet-pytorch architecture definitions:

- efficientnet-pytorch ``EfficientNet``: ``_conv_stem`` +
  ``Conv2dStaticSamePadding`` (pads baked at the nominal image_size, 380
  for B4), ``_bn0`` (eps 1e-3), flat ``_blocks`` list of ``MBConvBlock``
  (expand/depthwise/SE/project, swish), plus ``_conv_head``/``_bn1``/
  ``_fc`` which smp's encoder does not use for the pyramid;
- smp ``LinknetDecoder``: blocks of Conv2dReLU -> TransposeX2(k4 s2 p1)
  -> Conv2dReLU with additive skips, channels 448-160-56-32-48-32;
- smp ``SegmentationHead``: biased 3x3 conv + sigmoid.

State-dict key names match smp exactly so the converter can be driven with
a synthetic checkpoint of this module.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

BN_EPS = 1e-3

# (expand, kernel, stride, in_f, out_f) per flat block for B4
# (width 1.4, depth 1.8 over the B0 spec; repeats [2, 4, 4, 6, 6, 8, 2]).
_B0_STAGES = [
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
]
WIDTH, DEPTH = 1.4, 1.8

# Static same-pads baked by efficientnet-pytorch at image_size=380
# (vfloodnet_tpu/models/efficientnet.py::_SMP_B4_S2_PADS).
_S2_PADS = {"stem": (0, 1), 1: (0, 1), 2: (2, 2), 3: (0, 1), 5: (1, 2)}


def round_filters(f):
    divisor = 8
    f = f * WIDTH
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def round_repeats(r):
    return int(math.ceil(r * DEPTH))


def _pad(x, pad):
    lo, hi = pad
    return F.pad(x, (lo, hi, lo, hi))


class MBConvBlock(nn.Module):
    def __init__(self, expand, kernel, stride, in_f, out_f, se_from, s2_pad):
        super().__init__()
        self.expand, self.kernel, self.stride = expand, kernel, stride
        self.in_f, self.out_f = in_f, out_f
        self.s2_pad = s2_pad
        mid = in_f * expand
        if expand != 1:
            self._expand_conv = nn.Conv2d(in_f, mid, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(mid, eps=BN_EPS)
        self._depthwise_conv = nn.Conv2d(mid, mid, kernel, stride=stride,
                                         padding=0, groups=mid, bias=False)
        self._bn1 = nn.BatchNorm2d(mid, eps=BN_EPS)
        se = max(1, se_from // 4)
        self._se_reduce = nn.Conv2d(mid, se, 1)
        self._se_expand = nn.Conv2d(se, mid, 1)
        self._project_conv = nn.Conv2d(mid, out_f, 1, bias=False)
        self._bn2 = nn.BatchNorm2d(out_f, eps=BN_EPS)

    def forward(self, x):
        h = x
        if self.expand != 1:
            h = F.silu(self._bn0(self._expand_conv(h)))
        pad = (self.s2_pad if self.stride == 2
               else (self.kernel // 2, self.kernel // 2))
        h = F.silu(self._bn1(self._depthwise_conv(_pad(h, pad))))
        s = F.adaptive_avg_pool2d(h, 1)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        h = h * torch.sigmoid(s)
        h = self._bn2(self._project_conv(h))
        if self.stride == 1 and self.in_f == self.out_f:
            h = h + x
        return h


class EfficientNetB4Encoder(nn.Module):
    """efficientnet-pytorch layout; forward returns the smp feature pyramid
    (f2, f4, f8, f16, f32)."""

    def __init__(self):
        super().__init__()
        stem_f = round_filters(32)
        self._conv_stem = nn.Conv2d(3, stem_f, 3, stride=2, padding=0,
                                    bias=False)
        self._bn0 = nn.BatchNorm2d(stem_f, eps=BN_EPS)
        blocks = []
        self._s2_flags = []
        for si, (e, k, s, in_f, out_f, r) in enumerate(_B0_STAGES):
            in_sf, out_sf = round_filters(in_f), round_filters(out_f)
            for bi in range(round_repeats(r)):
                stride = s if bi == 0 else 1
                bin_f = in_sf if bi == 0 else out_sf
                se_from = bin_f
                s2_pad = _S2_PADS.get(si) if stride == 2 else None
                blocks.append(MBConvBlock(e, k, stride, bin_f, out_sf,
                                          se_from, s2_pad))
                self._s2_flags.append(stride == 2)
        self._blocks = nn.ModuleList(blocks)
        # present in the pickle but unused by smp's pyramid — the converter
        # must skip these
        head_f = round_filters(1280)
        self._conv_head = nn.Conv2d(round_filters(320), head_f, 1, bias=False)
        self._bn1 = nn.BatchNorm2d(head_f, eps=BN_EPS)
        self._fc = nn.Linear(head_f, 1000)

    def forward(self, x):
        h = F.silu(self._bn0(self._conv_stem(_pad(x, _S2_PADS["stem"]))))
        pyramid = [h]                       # /2
        for blk, is_s2 in zip(self._blocks, self._s2_flags):
            if is_s2:
                pyramid.append(h)
            h = blk(h)
        pyramid.append(h)                   # /32
        return pyramid[:1] + pyramid[2:]    # drop the duplicate /2 entry


class Conv2dReLU(nn.Sequential):
    def __init__(self, in_f, out_f, k):
        super().__init__(nn.Conv2d(in_f, out_f, k, padding=k // 2,
                                   bias=False),
                         nn.BatchNorm2d(out_f, eps=BN_EPS),
                         nn.ReLU(inplace=True))


class TransposeX2(nn.Sequential):
    def __init__(self, in_f, out_f):
        super().__init__(nn.ConvTranspose2d(in_f, out_f, 4, stride=2,
                                            padding=1, bias=False),
                         nn.BatchNorm2d(out_f, eps=BN_EPS),
                         nn.ReLU(inplace=True))


class DecoderBlock(nn.Module):
    def __init__(self, in_f, out_f):
        super().__init__()
        self.block = nn.Sequential(Conv2dReLU(in_f, in_f // 4, 1),
                                   TransposeX2(in_f // 4, in_f // 4),
                                   Conv2dReLU(in_f // 4, out_f, 1))

    def forward(self, x):
        return self.block(x)


class LinknetDecoder(nn.Module):
    CHANNELS = (448, 160, 56, 32, 48, 32)

    def __init__(self):
        super().__init__()
        ch = self.CHANNELS
        self.blocks = nn.ModuleList(
            [DecoderBlock(ch[i], ch[i + 1]) for i in range(5)])

    def forward(self, features):
        f2, f4, f8, f16, f32 = features
        skips = (f16, f8, f4, f2)
        x = f32
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i < len(skips):
                x = x + skips[i]
        return x


class TorchLinknetSMP(nn.Module):
    """The full smp.Linknet(efficientnet-b4) graph, eval semantics."""

    def __init__(self):
        super().__init__()
        self.encoder = EfficientNetB4Encoder()
        self.decoder = LinknetDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(32, 1, 3, padding=1, bias=True))

    def forward(self, x):
        feats = self.encoder(x)
        d = self.decoder(feats)
        return torch.sigmoid(self.segmentation_head(d))


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Random weights AND random BN running stats (unit stats would make
    every BN an affine no-op and weaken the parity check)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d, nn.Linear)):
                m.weight.normal_(0.0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.05, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
