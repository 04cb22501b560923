"""Detection backbones: ResNet-101 and ResNeXt-101-32x8d (Flax, NHWC).

Counterparts of the reference's Detectron2 backbones
(estimation/configs/InstanceSegmentation/pointrend_rcnn_X_101_32x8d_FPN_3x
_coco.yaml and COCO-Keypoints/keypoint_rcnn_R_101_FPN_3x.yaml): frozen BN,
caffe-style stride placement on the 1x1 conv (``stride_in_1x1=True``, the
Detectron2 default for MSRA weights), grouped 3x3 convs for ResNeXt.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..resnet import FrozenBN


class DetBottleneck(nn.Module):
    width: int            # 3x3 conv width
    out_f: int
    stride: int = 1
    groups: int = 1
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        y = nn.Conv(self.width, (1, 1), strides=(s1, s1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = FrozenBN(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=(s3, s3), padding=1,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBN(dtype=self.dtype, name="bn3")(y)
        if x.shape[-1] != self.out_f or self.stride != 1:
            x = nn.Conv(self.out_f, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="shortcut")(x)
            x = FrozenBN(dtype=self.dtype, name="shortcut_bn")(x)
        return nn.relu(y + x)


class DetectionResNet(nn.Module):
    """Returns (C2, C3, C4, C5) at strides 4, 8, 16, 32."""
    blocks: Sequence[int] = (3, 4, 23, 3)    # R-101
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        h = FrozenBN(dtype=self.dtype, name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        out_f = 256
        for stage, n_blocks in enumerate(self.blocks):
            width = self.groups * self.width_per_group * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                h = DetBottleneck(width, out_f, stride if b == 0 else 1,
                                  self.groups, dtype=self.dtype,
                                  name=f"res{stage + 2}_block{b}")(h)
            outs.append(h)
            out_f *= 2
        return tuple(outs)


def resnext101_32x8d(dtype=jnp.float32) -> DetectionResNet:
    """Backbone of the stop-sign PointRend model."""
    return DetectionResNet(blocks=(3, 4, 23, 3), groups=32, width_per_group=8,
                           dtype=dtype)


def resnet101(dtype=jnp.float32) -> DetectionResNet:
    """Backbone of the people Keypoint R-CNN model."""
    return DetectionResNet(blocks=(3, 4, 23, 3), groups=1, width_per_group=64,
                           dtype=dtype)
