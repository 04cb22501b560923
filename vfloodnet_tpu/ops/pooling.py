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
    # Single fused 2-D window: measured ~1 ms FASTER in the fused video step
    # than an exact separable two-pass split (XLA's fused reduce_window
    # lowering beats paying an extra [N, H/2, W/2, 256] intermediate).
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, size, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return summed / float(size * size)


def local_max_pool(x: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    pad = size // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
