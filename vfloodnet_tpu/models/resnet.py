"""ResNet-50 feature backbone (Flax, NHWC, frozen BatchNorm).

TPU-native counterpart of the torchvision resnet50 stages used by the
reference encoders (video_module/model/AFB_URR.py:39-47,69-77): stem + layer1
(1/4, 256) + layer2 (1/8, 512) + layer3 (1/16, 1024). layer4 is never used by
AFB-URR, so it is omitted.

BatchNorm always runs with running statistics: the reference freezes BN even
during training (train_video_seg.py:106, myutils set_bn_eval), so the stats
live in the ``batch_stats`` collection and are never updated. Convs compute in
``dtype`` (bf16 on TPU for MXU throughput) with f32 params.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """BatchNorm evaluated with stored running statistics (the reference
    freezes BN during training, train_video_seg.py:106 — its encoders are
    ImageNet-pretrained so the stored stats are meaningful).

    When applied with the ``batch_stats`` collection MUTABLE, it becomes a
    live BatchNorm: normalises with the current batch statistics and
    EMA-updates the stored stats. Needed for training encoders from
    scratch (no pretrained stats exist in this environment): with
    init-value stats the layer is an identity, activation variance decays
    through deep ReLU stacks, and optimisation plateaus at the base-rate
    output (measured: AFB-URR demo training pins at CE ln2 + 0.5 = 1.1931
    without this)."""
    dtype: Any = jnp.float32
    momentum: float = 0.9
    # torch BatchNorm2d default; efficientnet-pytorch (the reference smp
    # encoder) uses 1e-3 — LinkNetSMP passes that through.
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean_v = self.variable("batch_stats", "mean",
                               lambda: jnp.zeros((f,), jnp.float32))
        var_v = self.variable("batch_stats", "var",
                              lambda: jnp.ones((f,), jnp.float32))
        if self.is_mutable_collection("batch_stats") and \
                not self.is_initializing():
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            m = self.momentum
            mean_v.value = m * mean_v.value + (1.0 - m) * mean
            var_v.value = m * var_v.value + (1.0 - m) * var
        else:
            mean, var = mean_v.value, var_v.value
        inv = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(self.dtype)


def _space_to_depth_stem_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                              dtype) -> jnp.ndarray:
    """The ResNet 7x7/stride-2/pad-3 stem conv, lowered as space-to-depth +
    a 4x4/stride-1 VALID conv — numerically EXACT (same products, MXU-
    friendlier): a stride-2 7x7 conv over 3-5 input channels leaves the
    TPU's 128-lane channel packing almost empty (profiled 0.53 ms at the
    480p operating point, ~4 TFLOP/s), while the s2d form contracts
    4*4*(4*C) channels per output. Kernel zero-padded 7->8 then phase-
    split; input padded 3 (+1 to even) and cropped to the torch output
    size, replicating conv1's geometry exactly."""
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    ph = (h + 6) % 2
    pw = (w + 6) % 2
    xp = jnp.pad(x, ((0, 0), (3, 3 + ph), (3, 3 + pw), (0, 0)))
    h2, w2 = xp.shape[1] // 2, xp.shape[2] // 2
    xs = xp.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h2, w2, 4 * c)
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))      # [8,8,c,f]
    ks = kp.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    ks = ks.reshape(4, 4, 4 * c, f)
    out = jax.lax.conv_general_dilated(
        xs.astype(dtype), ks.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    return out[:, :oh, :ow]


class StemConv(nn.Module):
    """Drop-in replacement for ``nn.Conv(64, (7,7), strides=2, padding=3,
    use_bias=False, name='conv1')`` with the space-to-depth lowering (param
    tree identical: ``conv1/kernel`` [7,7,C,64]).

    ``extra_in``/``extra_kernels`` fuse additional input planes into the
    SAME stem conv by channel concatenation — exactly the reference memory
    encoder's ``conv1(f) + conv1_m(m) + conv1_o(o)`` sum (AFB_URR.py:55-56,
    linearity), without paying two more full-resolution 1-channel 7x7
    convs (profiled 0.65 ms combined at 480p)."""
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, extra_in=(), extra_kernels=()):
        import os
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal"),
            (7, 7, x.shape[-1], self.features))
        if extra_in:
            x = jnp.concatenate([x] + [e.astype(x.dtype) for e in extra_in],
                                axis=-1)
            kernel = jnp.concatenate(
                [kernel] + [k.astype(kernel.dtype) for k in extra_kernels],
                axis=2)
        # Default lowering is the plain stride-2 conv: a within-session A/B
        # on the fused video step measured the space-to-depth form 2.5 ms
        # SLOWER per frame (13.4 vs 10.9 ms — the 480p input reshuffle
        # outweighs the stem conv it saves once XLA fuses; the standalone
        # trace that motivated s2d had charged the stem its un-overlapped
        # cost). The channel-concat mask-stem fusion above is the part
        # that pays; VFLOOD_STEM_S2D=1 re-enables s2d for hosts where the
        # trade differs.
        if os.environ.get("VFLOOD_STEM_S2D", "0") == "1":
            return _space_to_depth_stem_conv(x, kernel, self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (2, 2),
            [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class StemKernel(nn.Module):
    """Parameter-only holder for an extra stem plane's 7x7 kernel (param
    tree identical to the ``nn.Conv`` it replaces: ``<name>/kernel``);
    consumed by :class:`StemConv` via ``extra_kernels``."""
    in_features: int = 1
    features: int = 64

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal"),
            (7, 7, self.in_features, self.features))


class Bottleneck(nn.Module):
    """torchvision-v1.5-style bottleneck (stride on the 3x3 conv)."""
    features: int   # bottleneck width; output is 4x
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_f = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBN(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBN(dtype=self.dtype, name="bn3")(y)
        if residual.shape[-1] != out_f or self.stride != 1:
            residual = nn.Conv(out_f, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBN(dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResLayer(nn.Module):
    features: int
    blocks: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.features, self.stride, dtype=self.dtype,
                       name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.features, 1, dtype=self.dtype,
                           name=f"block{i}")(x)
        return x


class ResNet50Backbone(nn.Module):
    """Stem + layer1..layer3 (+ optional layer4 for consumers needing the
    2048-channel /32 grid, e.g. METRO's torchvision trunk). Extra stem
    streams (mask channels) are added *before* the stem BN, matching the
    reference memory encoder (AFB_URR.py:55-56)."""
    dtype: Any = jnp.float32
    with_layer4: bool = False

    def setup(self):
        self.conv1 = StemConv(64, dtype=self.dtype, name="conv1")
        self.bn1 = FrozenBN(dtype=self.dtype, name="bn1")
        self.layer1 = ResLayer(64, 3, 1, dtype=self.dtype, name="layer1")
        self.layer2 = ResLayer(128, 4, 2, dtype=self.dtype, name="layer2")
        self.layer3 = ResLayer(256, 6, 2, dtype=self.dtype, name="layer3")
        if self.with_layer4:
            self.layer4 = ResLayer(512, 3, 2, dtype=self.dtype,
                                   name="layer4")

    def stem(self, x, extra=None, extra_in=(), extra_kernels=()):
        y = self.conv1(x, extra_in, extra_kernels)
        if extra is not None:
            y = y + extra
        y = self.bn1(y)
        r1 = nn.relu(y)                                   # 1/2, 64
        return r1

    def __call__(self, x, extra=None, extra_in=(), extra_kernels=()
                 ) -> Tuple[jnp.ndarray, ...]:
        r1 = self.stem(x, extra, extra_in, extra_kernels)
        y = nn.max_pool(r1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        r2 = self.layer1(y)                               # 1/4, 256
        r3 = self.layer2(r2)                              # 1/8, 512
        r4 = self.layer3(r3)                              # 1/16, 1024
        if self.with_layer4:
            r5 = self.layer4(r4)                          # 1/32, 2048
            return r5, r4, r3, r2
        return r4, r3, r2, r1
