"""EfficientNet-B4 feature encoder (Flax, NHWC).

Encoder for the still-image water segmentation model — capability parity with
the reference's segmentation_models_pytorch LinkNet(encoder=efficientnet-b4)
(train_image_seg.py:82-89). Re-implemented TPU-first: NHWC, bf16-capable,
BN with running stats in ``batch_stats``.

Returns pyramid features at reductions /2, /4, /8, /16, /32 (channels
48, 32, 56, 160, 448 for B4).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import FrozenBN

# Base (B0) stage spec: (expand, kernel, stride, in_f, out_f, repeats)
_B0_STAGES = [
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
]


def round_filters(f: int, width: float, divisor: int = 8) -> int:
    f = f * width
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(r * depth))


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(f, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class MBConv(nn.Module):
    expand: int
    kernel: int
    stride: int
    out_f: int
    se_from: int   # SE bottleneck derives from the block *input* channels
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5
    # Explicit ((lo,hi),(lo,hi)) padding for the depthwise conv; None =
    # symmetric k//2. smp-compat mode passes efficientnet-pytorch's
    # static same-padding here (see EfficientNetFeatures.smp_pads).
    dw_pad: Any = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(in_f * self.expand, (1, 1), use_bias=False,
                        dtype=self.dtype, name="expand_conv")(h)
            h = FrozenBN(dtype=self.dtype, eps=self.bn_eps,
                         name="expand_bn")(h)
            h = nn.silu(h)
        h = nn.Conv(h.shape[-1], (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(self.dw_pad if self.dw_pad is not None
                             else self.kernel // 2),
                    feature_group_count=h.shape[-1], use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = FrozenBN(dtype=self.dtype, eps=self.bn_eps, name="dw_bn")(h)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, self.se_from // 4), dtype=self.dtype,
                          name="se")(h)
        h = nn.Conv(self.out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = FrozenBN(dtype=self.dtype, eps=self.bn_eps, name="project_bn")(h)
        if self.stride == 1 and in_f == self.out_f:
            h = h + x
        return h


# efficientnet-pytorch bakes its "same" padding from the model's nominal
# image_size (380 for B4) at construction and applies those STATIC pads to
# every input — the reference's smp encoder therefore runs 416 px inputs
# through pads computed at 380 (Conv2dStaticSamePadding). Per stride-2
# conv, (lo, hi) at the B4 trace sizes 380→190→95→48→24:
_SMP_B4_S2_PADS = {
    "stem": (0, 1),     # k3, in 380 (even)
    1: (0, 1),          # stage1 k3, in 190 (even)
    2: (2, 2),          # stage2 k5, in 95 (odd!)
    3: (0, 1),          # stage3 k3, in 48 (even)
    5: (1, 2),          # stage5 k5, in 24 (even)
}


class EfficientNetFeatures(nn.Module):
    """Wrapper returning exactly the 5 pyramid levels /2,/4,/8,/16,/32.

    ``smp_pads``/``bn_eps=1e-3`` reproduce the reference smp encoder's
    exact arithmetic (efficientnet-pytorch static same-padding + BN eps)
    so its released weights are loadable with forward parity; defaults
    keep the TPU-first symmetric-padding graph the bundled demo
    checkpoints were trained with.
    """
    width: float = 1.4
    depth: float = 1.8
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5
    smp_pads: bool = False
    # The /2 pyramid level: False = output of the stride-1 stage0 blocks
    # (24 ch for B4; what the TPU-first LinkNet and its bundled checkpoint
    # use), True = the raw stem output (48 ch) — smp's EfficientNetEncoder
    # convention (its B4 out_channels are (3, 48, 32, 56, 160, 448)), which
    # the weight-loadable LinkNetSMP needs.
    f2_stem: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        stem_f = round_filters(32, self.width)
        stem_pad = (_SMP_B4_S2_PADS["stem"],) * 2 if self.smp_pads else 1
        h = nn.Conv(stem_f, (3, 3), strides=(2, 2), padding=stem_pad,
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        h = FrozenBN(dtype=self.dtype, eps=self.bn_eps, name="stem_bn")(h)
        h = nn.silu(h)                                   # /2
        stem_out = h

        pyramid = {2: h}
        reduction = 2
        for si, (e, k, s, in_f, out_f, r) in enumerate(_B0_STAGES):
            out_sf = round_filters(out_f, self.width)
            in_sf = round_filters(in_f, self.width)
            reps = round_repeats(r, self.depth)
            for bi in range(reps):
                stride = s if bi == 0 else 1
                se_from = in_sf if bi == 0 else out_sf
                if stride == 2:
                    pyramid[reduction] = h
                    reduction *= 2
                dw_pad = None
                if self.smp_pads and stride == 2:
                    dw_pad = (_SMP_B4_S2_PADS[si],) * 2
                h = MBConv(e, k, stride, out_sf, se_from, dtype=self.dtype,
                           bn_eps=self.bn_eps, dw_pad=dw_pad,
                           name=f"stage{si}_block{bi}")(h)
        pyramid[reduction] = h                           # /32
        if self.f2_stem:
            pyramid[2] = stem_out
        return tuple(pyramid[r] for r in (2, 4, 8, 16, 32))
