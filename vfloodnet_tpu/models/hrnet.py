"""HRNet classification-style backbone (Flax, NHWC).

The reference's METRO body-mesh model uses HRNet-w64 grid features
(scripts/inference_bodymesh.py:228-293, MeshTransformer submodule). This is
the TPU-native HRNet: a stride-4 stem, a bottleneck stage, then three
multi-resolution stages whose parallel branches exchange information through
fuse layers (strided-conv down / 1x1+upsample up), and a final head that
aggregates all branches into a single 2048-d grid feature map.

Configured for w64 by default; w18/w32/w48 via ``width``.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import FrozenBN


def _up_to(x, target_hw):
    n, h, w, c = x.shape
    th, tw = target_hw
    return jax.image.resize(x, (n, th, tw, c), method="nearest")


class BasicBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = FrozenBN(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(dtype=self.dtype, name="bn2")(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, name="down_conv")(x)
            x = FrozenBN(dtype=self.dtype, name="down_bn")(x)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_f = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBN(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBN(dtype=self.dtype, name="bn3")(y)
        if x.shape[-1] != out_f:
            x = nn.Conv(out_f, (1, 1), use_bias=False, dtype=self.dtype,
                        name="down_conv")(x)
            x = FrozenBN(dtype=self.dtype, name="down_bn")(x)
        return nn.relu(y + x)


class FuseLayer(nn.Module):
    """Exchange information between parallel branches."""
    out_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        outs = []
        for i, ci in enumerate(self.out_channels):
            acc = None
            for j, x in enumerate(xs):
                if j == i:
                    y = x
                    if x.shape[-1] != ci:
                        y = nn.Conv(ci, (1, 1), use_bias=False,
                                    dtype=self.dtype,
                                    name=f"f{j}to{i}_conv")(y)
                        y = FrozenBN(dtype=self.dtype,
                                     name=f"f{j}to{i}_bn")(y)
                elif j < i:
                    # downsample j -> i with (i - j) stride-2 convs
                    y = x
                    for s in range(i - j):
                        last = s == (i - j - 1)
                        y = nn.Conv(ci if last else x.shape[-1], (3, 3),
                                    strides=(2, 2), padding=1,
                                    use_bias=False, dtype=self.dtype,
                                    name=f"f{j}to{i}_conv{s}")(y)
                        y = FrozenBN(dtype=self.dtype,
                                     name=f"f{j}to{i}_bn{s}")(y)
                        if not last:
                            y = nn.relu(y)
                else:
                    # upsample j -> i: 1x1 conv + nearest upsample
                    y = nn.Conv(ci, (1, 1), use_bias=False, dtype=self.dtype,
                                name=f"f{j}to{i}_conv")(x)
                    y = FrozenBN(dtype=self.dtype, name=f"f{j}to{i}_bn")(y)
                    y = _up_to(y, xs[i].shape[1:3])
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNetStage(nn.Module):
    channels: Sequence[int]
    blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        # add a new (downsampled) branch if needed
        while len(xs) < len(self.channels):
            j = len(xs)
            y = nn.Conv(self.channels[j], (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f"new_branch{j}_conv")(xs[-1])
            y = FrozenBN(dtype=self.dtype, name=f"new_branch{j}_bn")(y)
            xs = xs + [nn.relu(y)]

        ys = []
        for bi, (x, c) in enumerate(zip(xs, self.channels)):
            h = x
            for k in range(self.blocks):
                h = BasicBlock(c, dtype=self.dtype,
                               name=f"branch{bi}_block{k}")(h)
            ys.append(h)
        return FuseLayer(self.channels, dtype=self.dtype, name="fuse")(ys)


class HRNet(nn.Module):
    """HRNet backbone returning a 2048-d aggregated grid feature (/32) plus
    the highest-resolution branch (/4)."""
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = self.width
        chans = (w, 2 * w, 4 * w, 8 * w)

        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem1")(x)
        h = FrozenBN(dtype=self.dtype, name="stem1_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem2")(h)
        h = FrozenBN(dtype=self.dtype, name="stem2_bn")(h)
        h = nn.relu(h)                                   # /4

        for k in range(4):
            h = Bottleneck(64, dtype=self.dtype, name=f"layer1_{k}")(h)

        xs = [h]
        xs = HRNetStage(chans[:2], dtype=self.dtype, name="stage2")(xs)
        xs = HRNetStage(chans[:3], dtype=self.dtype, name="stage3")(xs)
        xs = HRNetStage(chans[:4], dtype=self.dtype, name="stage4")(xs)

        # incre + downsample head (classification-style aggregation to /32)
        head_chans = (128, 256, 512, 1024)
        ys = []
        for i, (x_i, c) in enumerate(zip(xs, head_chans)):
            ys.append(Bottleneck(c // 4, dtype=self.dtype,
                                 name=f"incre{i}")(x_i))
        agg = ys[0]
        for i in range(1, 4):
            agg = nn.Conv(head_chans[i], (3, 3), strides=(2, 2), padding=1,
                          use_bias=False, dtype=self.dtype,
                          name=f"down{i}")(agg)
            agg = FrozenBN(dtype=self.dtype, name=f"down{i}_bn")(agg)
            agg = nn.relu(agg) + ys[i]
        out = nn.Conv(2048, (1, 1), use_bias=False, dtype=self.dtype,
                      name="final")(agg)
        out = FrozenBN(dtype=self.dtype, name="final_bn")(out)
        return nn.relu(out), xs[0]
