"""HRNet classification-style backbone (Flax, NHWC), weight-mappable.

The reference's METRO body-mesh model uses HRNet-w64 grid features
(scripts/inference_bodymesh.py:228-293; the MeshTransformer submodule's
``hrnet_cls_net_featmaps`` variant of the public HRNet-Image-Classification
network). This Flax implementation follows that module graph exactly so the
released ``metro_3dpw_state_dict.bin`` backbone weights convert one-to-one
(core/convert_metro.py):

- stride-4 stem (conv1/bn1/conv2/bn2),
- ``layer1``: 4 Bottlenecks (64 -> 256),
- explicit transition layers (transition1 re-convs BOTH branches; later
  transitions only create the new downsampled branch),
- stages of repeated HighResolutionModules — W64 runs 1/4/3 modules in
  stages 2/3/4 — each: 4 BasicBlocks per branch + full fuse layers
  (strided-conv down / 1x1-conv + nearest-upsample up, ReLU after the sum),
- featmaps head: per-branch incre Bottlenecks, biased strided downsamp
  convs, biased 1x1 final conv to the 2048-d /32 grid feature.

Configured for w64 by default; w18/w32/w48 via ``width`` (module counts are
the W64 schedule unless overridden).
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
    """Stage BasicBlock (channels always match inside a branch, so there is
    no downsample path — transitions handle channel changes, as in the
    official network)."""
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
                        name="downsample_conv")(x)
            x = FrozenBN(dtype=self.dtype, name="downsample_bn")(x)
        return nn.relu(y + x)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch block stacks + fuse layers
    (official HighResolutionModule; torch keys
    ``stage{s}.{m}.branches.{b}.{k}.*`` / ``.fuse_layers.{i}.{j}.*``)."""
    channels: Sequence[int]
    blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        ys = []
        for b, (x, c) in enumerate(zip(xs, self.channels)):
            h = x
            for k in range(self.blocks):
                h = BasicBlock(c, dtype=self.dtype,
                               name=f"branch{b}_block{k}")(h)
            ys.append(h)

        n = len(self.channels)
        outs = []
        for i in range(n):
            acc = ys[i]
            for j in range(n):
                if j == i:
                    continue
                if j > i:
                    # up: 1x1 conv + BN + nearest upsample 2**(j-i)
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype,
                                name=f"fuse{i}_{j}_conv")(ys[j])
                    y = FrozenBN(dtype=self.dtype,
                                 name=f"fuse{i}_{j}_bn")(y)
                    y = _up_to(y, ys[i].shape[1:3])
                else:
                    # down: (i-j) stride-2 3x3 convs; intermediate keep
                    # the source width, only the last maps to channels[i]
                    y = ys[j]
                    for s in range(i - j):
                        last = s == (i - j - 1)
                        cout = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(cout, (3, 3), strides=(2, 2), padding=1,
                                    use_bias=False, dtype=self.dtype,
                                    name=f"fuse{i}_{j}_conv{s}")(y)
                        y = FrozenBN(dtype=self.dtype,
                                     name=f"fuse{i}_{j}_bn{s}")(y)
                        if not last:
                            y = nn.relu(y)
                acc = acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    """HRNet backbone returning a 2048-d aggregated grid feature (/32) plus
    the highest-resolution branch (/4)."""
    width: int = 64
    # HighResolutionModules per stage — the W64 classification schedule
    modules: Tuple[int, int, int] = (1, 4, 3)
    dtype: Any = jnp.float32

    def _trans(self, x, cout: int, name: str, stride: int):
        y = nn.Conv(cout, (3, 3), strides=(stride, stride), padding=1,
                    use_bias=False, dtype=self.dtype, name=f"{name}_conv")(x)
        y = FrozenBN(dtype=self.dtype, name=f"{name}_bn")(y)
        return nn.relu(y)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = self.width
        chans = (w, 2 * w, 4 * w, 8 * w)

        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = FrozenBN(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = FrozenBN(dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)                                   # /4

        for k in range(4):
            h = Bottleneck(64, dtype=self.dtype, name=f"layer1_{k}")(h)

        # transition1 convs BOTH branches (256 -> w, 256 -> 2w at /8)
        xs = [self._trans(h, chans[0], "transition1_0", 1),
              self._trans(h, chans[1], "transition1_1", 2)]
        for m in range(self.modules[0]):
            xs = HRModule(chans[:2], dtype=self.dtype,
                          name=f"stage2_{m}")(xs)

        xs = xs + [self._trans(xs[-1], chans[2], "transition2_2", 2)]
        for m in range(self.modules[1]):
            xs = HRModule(chans[:3], dtype=self.dtype,
                          name=f"stage3_{m}")(xs)

        xs = xs + [self._trans(xs[-1], chans[3], "transition3_3", 2)]
        for m in range(self.modules[2]):
            xs = HRModule(chans[:4], dtype=self.dtype,
                          name=f"stage4_{m}")(xs)

        # featmaps head: incre Bottlenecks + biased strided downsamp convs
        head_planes = (32, 64, 128, 256)
        ys = [Bottleneck(head_planes[i], dtype=self.dtype,
                         name=f"incre{i}")(xs[i]) for i in range(4)]
        agg = ys[0]
        for i in range(3):                     # torch downsamp_modules.{i}
            y = nn.Conv(head_planes[i + 1] * 4, (3, 3), strides=(2, 2),
                        padding=1, use_bias=True, dtype=self.dtype,
                        name=f"downsamp{i}_conv")(agg)
            y = FrozenBN(dtype=self.dtype, name=f"downsamp{i}_bn")(y)
            agg = ys[i + 1] + nn.relu(y)
        out = nn.Conv(2048, (1, 1), use_bias=True, dtype=self.dtype,
                      name="final_conv")(agg)
        out = FrozenBN(dtype=self.dtype, name="final_bn")(out)
        return nn.relu(out), xs[0]
