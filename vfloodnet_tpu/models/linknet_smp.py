"""smp-layout-compatible LinkNet variant (EfficientNet-B4 encoder).

The default :class:`~vfloodnet_tpu.models.linknet.LinkNet` uses a TPU-first
resize+conv decoder, which can never load the reference's pickled
``smp.Linknet(encoder_name='efficientnet-b4', classes=1,
activation='sigmoid')`` (train_image_seg.py:82-89, loaded whole at
test_image_seg.py:133). This module is the weight-load-faithful variant:

- decoder blocks are exactly segmentation_models_pytorch's LinknetDecoder:
  ``Conv2dReLU(in, in//4, 1) -> TransposeX2(in//4, k=4, s=2, p=1) ->
  Conv2dReLU(in//4, out, 1)``, channels 448-160-56-32-48-32 with additive
  skips from the /16, /8, /4 and /2 pyramid levels, final block reaching
  stride 1;
- ``segmentation_head`` is a biased 3x3 conv to 1 class + sigmoid;
- the encoder runs with efficientnet-pytorch arithmetic: BN eps 1e-3 and
  the STATIC same-paddings that efficientnet-pytorch bakes at the model's
  nominal image_size (380 for B4) and applies to every input — the
  reference feeds 416 px images through those 380-baked pads, and so does
  this variant (models/efficientnet.py::_SMP_B4_S2_PADS).

Converted reference weights load via
:func:`vfloodnet_tpu.core.convert.convert_smp_linknet_state_dict`; forward
parity is tested against a from-scratch torch re-instantiation of the smp
layout (tests/torch_smp.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .efficientnet import EfficientNetFeatures
from .linknet import IMAGENET_MEAN, IMAGENET_STD
from .resnet import FrozenBN

# LinknetDecoder channel plan for the B4 encoder: encoder channels
# (48, 32, 56, 160, 448) reversed + prefinal 32.
_B4_DECODER_CHANNELS = (448, 160, 56, 32, 48, 32)


class TorchConvTranspose2d(nn.Module):
    """``nn.ConvTranspose2d(in, out, k, stride, padding)`` with torch-exact
    semantics (gradient-of-conv): ``lax.conv_transpose`` with
    ``use_consistent_padding=True`` interprets ``padding`` as the forward
    conv's padding — PyTorch's convention — and ``transpose_kernel=True``
    applies the kernel in the flipped/swapped orientation. Kernel is stored
    as ``[kH, kW, out, in]`` = ``torch_weight.transpose(2, 3, 1, 0)``.
    """
    out_f: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.variance_scaling(
                1.0, "fan_in", "normal"),
            (self.kernel, self.kernel, self.out_f, in_f))
        return jax.lax.conv_transpose(
            x.astype(self.dtype),
            w.astype(self.dtype),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
            use_consistent_padding=True)


class SMPDecoderBlock(nn.Module):
    """smp LinknetDecoder block: 1x1 bottleneck -> ConvTranspose 2x -> 1x1
    expand, each conv bias-free + BN(eps 1e-3) + ReLU."""
    out_f: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] // 4
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = FrozenBN(dtype=self.dtype, eps=1e-3, name="bn1")(h)
        h = nn.relu(h)
        h = TorchConvTranspose2d(mid, dtype=self.dtype, name="tconv")(h)
        h = FrozenBN(dtype=self.dtype, eps=1e-3, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBN(dtype=self.dtype, eps=1e-3, name="bn3")(h)
        return nn.relu(h)


class SMPDecoderHead(nn.Module):
    """LinknetDecoder + SegmentationHead on a (f2, f4, f8, f16, f32)
    pyramid — factored out so the torch-oracle parity test can drive it on
    raw pyramid features without the encoder."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f2, f4, f8, f16, f32):
        ch = _B4_DECODER_CHANNELS
        skips = (f16, f8, f4, f2)
        d = f32
        for i in range(5):
            d = SMPDecoderBlock(ch[i + 1], dtype=self.dtype,
                                name=f"block{i}")(d)
            if i < len(skips):
                d = d + skips[i]
        logits = nn.Conv(1, (3, 3), padding=1, use_bias=True,
                         dtype=self.dtype, name="head")(d)
        return jax.nn.sigmoid(logits.astype(jnp.float32))


class LinkNetSMP(nn.Module):
    """Binary water segmentation with the reference smp graph; returns
    sigmoid probability [N, H, W, 1]. Input H, W must be multiples of 32
    (the reference operates at 416x416, test_image_seg.py:79)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img01: jnp.ndarray) -> jnp.ndarray:
        if img01.shape[1] % 32 or img01.shape[2] % 32:
            raise ValueError("LinkNetSMP input H/W must be x32 "
                             f"(got {img01.shape[1:3]})")
        x = (img01 - IMAGENET_MEAN) / IMAGENET_STD
        f2, f4, f8, f16, f32 = EfficientNetFeatures(
            dtype=self.dtype, bn_eps=1e-3, smp_pads=True, f2_stem=True,
            name="encoder")(x.astype(self.dtype))
        return SMPDecoderHead(dtype=self.dtype, name="decoder")(
            f2, f4, f8, f16, f32)
