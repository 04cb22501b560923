"""Local pooling ops for the URR decoder.

Equivalent to the reference decoder's 7x7 stride-1 avg/max pools
(video_module/model/AFB_URR.py:198-199) used for neighbourhood reference and
confidence in the local refinement branch. NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_avg_pool(x: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """Stride-1 average pool with zero padding (count includes padding,
    matching torch ``nn.AvgPool2d(size, stride=1, padding=size//2)`` with
    count_include_pad=True default)."""
    pad = size // 2
    # Separable two-pass sum (exact for add with zero padding): size*2
    # reads per element instead of size**2 — the 7x7 pools run over
    # [N, H/2, W/2, 256] decoder features, where the window work dominates.
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, 1, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (0, 0), (0, 0)])
    summed = jax.lax.reduce_window(
        summed, 0.0, jax.lax.add, (1, 1, size, 1), (1, 1, 1, 1),
        [(0, 0), (0, 0), (pad, pad), (0, 0)])
    return summed / float(size * size)


def local_max_pool(x: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    pad = size // 2
    # Separable max (exact: max over a rectangle = max of row-max cols).
    out = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, 1, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (0, 0), (0, 0)])
    return jax.lax.reduce_window(
        out, -jnp.inf, jax.lax.max, (1, 1, size, 1), (1, 1, 1, 1),
        [(0, 0), (0, 0), (pad, pad), (0, 0)])
