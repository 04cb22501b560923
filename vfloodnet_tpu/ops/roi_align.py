"""ROIAlign (gather-based bilinear sampling, XLA-friendly).

Replaces Detectron2's C++/CUDA ROIAlign with vectorised bilinear gathers:
for each ROI, a pooled_size x pooled_size grid of sampling points (
``sampling_ratio`` sub-samples per bin, averaged), aligned=True half-pixel
convention (Detectron2 default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """feat [H, W, C]; ys/xs arbitrary same-shape index grids (float).
    Out-of-range samples clamp (matching ROIAlign's zero-boundary is handled
    by masking below)."""
    h, w, c = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0

    def gather(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return feat[yy, xx]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy1e = wy1[..., None]
    wx1e = wx1[..., None]
    out = (v00 * (1 - wy1e) * (1 - wx1e) + v01 * (1 - wy1e) * wx1e
           + v10 * wy1e * (1 - wx1e) + v11 * wy1e * wx1e)
    # zero outside the feature map (ROIAlign convention)
    inside = ((ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w))
    return out * inside[..., None]


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, pooled: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2
              ) -> jnp.ndarray:
    """feat [H, W, C]; boxes [R, 4] xyxy in image coords.
    Returns [R, pooled, pooled, C]."""

    def one(box):
        x1, y1, x2, y2 = box * spatial_scale
        # aligned=True: offset -0.5 (half pixel)
        x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        s = sampling_ratio
        n = pooled * s
        # sample centres of an n x n grid over the box
        ys = y1 + (jnp.arange(n) + 0.5) * bh / n
        xs = x1 + (jnp.arange(n) + 0.5) * bw / n
        grid_y = jnp.broadcast_to(ys[:, None], (n, n))
        grid_x = jnp.broadcast_to(xs[None, :], (n, n))
        samples = _bilinear_sample(feat, grid_y, grid_x)   # [n, n, C]
        c = samples.shape[-1]
        pooled_out = samples.reshape(pooled, s, pooled, s, c).mean(axis=(1, 3))
        return pooled_out

    return jax.vmap(one)(boxes)


def multilevel_roi_align(feats, boxes: jnp.ndarray, strides,
                         pooled: int = 7, sampling_ratio: int = 2,
                         canonical_size: float = 224.0,
                         canonical_level: int = 2) -> jnp.ndarray:
    """FPN level assignment (FPN paper eq. 1) + per-level ROIAlign.

    feats: list of [H_l, W_l, C] maps (P2..P5 order), strides: matching
    strides (4, 8, 16, 32). Returns [R, pooled, pooled, C].
    """
    ws = jnp.clip(boxes[:, 2] - boxes[:, 0], 0)
    hs = jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    scale = jnp.sqrt(ws * hs)
    lvl = jnp.floor(canonical_level + jnp.log2(
        jnp.maximum(scale, 1e-6) / canonical_size) + 1e-6)
    lvl = jnp.clip(lvl, 0, len(feats) - 1).astype(jnp.int32)

    outs = []
    for li, (f, st) in enumerate(zip(feats, strides)):
        outs.append(roi_align(f, boxes, pooled, 1.0 / st, sampling_ratio))
    stacked = jnp.stack(outs)                       # [L, R, p, p, C]
    return jnp.take_along_axis(
        stacked, lvl[None, :, None, None, None], axis=0)[0]
