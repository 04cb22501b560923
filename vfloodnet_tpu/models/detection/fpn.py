"""Feature Pyramid Network (Flax, NHWC). Lateral 1x1 + top-down 2x nearest
upsample + 3x3 output convs; P6 = maxpool(P5) for the R-CNN proposal level."""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _up2_nearest(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """feats: (C2, C3, C4, C5) -> [P2, P3, P4, P5, P6]."""
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i + 2}")(f)
            for i, f in enumerate(feats)]
        # top-down pathway
        tds = [laterals[-1]]
        for lat in laterals[-2::-1]:
            tds.append(lat + _up2_nearest(tds[-1]))
        tds = tds[::-1]                          # P2-first order
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"output{i + 2}")(t)
            for i, t in enumerate(tds)]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]
