"""PSPNet semantic segmentation (Flax, NHWC).

Counterpart of the Atlantis submodule's PSPNet used by the reference's
comparative eval harness (test_atlantis_model.py:9,22-23): dilated ResNet-50
trunk + Pyramid Pooling Module + classifier (+ aux head, matching the
two-output forward at test_atlantis_model.py:57).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import FrozenBN


class DilatedBottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_f = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBN(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBN(dtype=self.dtype, name="bn3")(y)
        if x.shape[-1] != out_f or self.stride != 1:
            x = nn.Conv(out_f, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = FrozenBN(dtype=self.dtype, name="down_bn")(x)
        return nn.relu(y + x)


class PPM(nn.Module):
    """Pyramid Pooling Module: global 1/2/3/6 bins + concat."""
    reduction: int = 512
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        outs = [x]
        for bi, b in enumerate(self.bins):
            pooled = jax.image.resize(x, (n, b, b, c), method="linear")
            pooled = nn.Conv(self.reduction, (1, 1), use_bias=False,
                             dtype=self.dtype, name=f"conv{bi}")(pooled)
            pooled = FrozenBN(dtype=self.dtype, name=f"bn{bi}")(pooled)
            pooled = nn.relu(pooled)
            outs.append(jax.image.resize(pooled, (n, h, w, self.reduction),
                                         method="linear"))
        return jnp.concatenate(outs, axis=-1)


class PSPNet(nn.Module):
    num_classes: int = 56
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [N, H, W, 3] normalized. Returns (aux_logits, logits) at 1/8
        resolution each (the harness upsamples, test_atlantis_model.py:45-59).
        """
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        h = FrozenBN(dtype=self.dtype, name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        specs = [
            (64, 3, 1, 1),     # layer1
            (128, 4, 2, 1),    # layer2 (1/8)
            (256, 6, 1, 2),    # layer3 dilated
            (512, 3, 1, 4),    # layer4 dilated
        ]
        aux_feat = None
        for li, (f, blocks, stride, dil) in enumerate(specs):
            for b in range(blocks):
                h = DilatedBottleneck(f, stride if b == 0 else 1, dil,
                                      dtype=self.dtype,
                                      name=f"layer{li + 1}_block{b}")(h)
            if li == 2:
                aux_feat = h

        h = PPM(dtype=self.dtype, name="ppm")(h)
        h = nn.Conv(512, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="cls_conv")(h)
        h = FrozenBN(dtype=self.dtype, name="cls_bn")(h)
        h = nn.relu(h)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="cls")(h)

        a = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="aux_conv")(aux_feat)
        a = FrozenBN(dtype=self.dtype, name="aux_bn")(a)
        a = nn.relu(a)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="aux")(a)
        return aux, logits
