"""ROI heads: box classification/regression, mask head with PointRend-style
point refinement, keypoint head. Static shapes throughout (fixed proposal /
detection counts with validity masks).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.nms import nms
from ...ops.roi_align import multilevel_roi_align, _bilinear_sample
from .rpn import decode_boxes

BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)   # Detectron2 ROI box transform


class BoxHead(nn.Module):
    """ROIAlign 7x7 -> 2xFC(1024) -> class scores + class-specific deltas."""
    num_classes: int = 80
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):                 # [R, 7, 7, C]
        r = pooled.shape[0]
        h = pooled.reshape(r, -1)
        h = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(h))
        h = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(h))
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="cls")(h)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="bbox")(h)
        return scores, deltas


class MaskHead(nn.Module):
    """4x conv(256) + 2x-deconv + 1x1 -> per-class 28x28 mask logits."""
    num_classes: int = 80
    conv_dim: int = 256
    num_conv: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):                 # [R, 14, 14, C]
        h = pooled
        for i in range(self.num_conv):
            h = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(h))
        h = nn.relu(nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="deconv")(h))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="predictor")(h)     # [R, 28, 28, K]


class CoarseMaskHead(nn.Module):
    """PointRend coarse mask head (D2 projects/PointRend ConvFC head):
    1x1 channel-reduce conv, flatten, 2 FCs, FC -> K x 7 x 7 logits."""
    num_classes: int = 80
    conv_dim: int = 256
    fc_dim: int = 1024
    output_side: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):                 # [R, 14, 14, C]
        r = pooled.shape[0]
        h = nn.relu(nn.Conv(self.conv_dim, (1, 1), dtype=self.dtype,
                            name="reduce")(pooled))
        h = h.reshape(r, -1)
        h = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(h))
        h = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(h))
        s = self.output_side
        out = nn.Dense(self.num_classes * s * s, dtype=self.dtype,
                       name="prediction")(h)
        return out.reshape(r, s, s, self.num_classes)


class PointHead(nn.Module):
    """PointRend point head: MLP over (fine-grained feature, coarse mask
    logit) per sampled point (projects/PointRend semantics)."""
    num_classes: int = 80
    fc_dim: int = 256
    num_fc: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine, coarse):
        """fine [R, P, C], coarse [R, P, K] -> logits [R, P, K]."""
        h = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_fc):
            h = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name=f"fc{i}")(h))
            h = jnp.concatenate([h, coarse], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="predictor")(h)


class KeypointHead(nn.Module):
    """8x conv(512) + deconv + 2x upsample -> K=17 keypoint heatmaps."""
    num_keypoints: int = 17
    conv_dim: int = 512
    num_conv: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):                 # [R, 14, 14, C]
        h = pooled
        for i in range(self.num_conv):
            h = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(h))
        h = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             dtype=self.dtype, name="deconv")(h)
        n, hh, ww, k = h.shape
        return jax.image.resize(h, (n, hh * 2, ww * 2, k), method="linear")


def box_inference(proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                  scores: jnp.ndarray, deltas: jnp.ndarray,
                  image_hw: Tuple[int, int], score_thresh: float,
                  nms_thresh: float = 0.5, max_det: int = 100):
    """Detectron2 FastRCNNOutputs inference: per-class decode + score
    threshold + class-aware NMS + top max_det. Static output.

    Returns (boxes [D, 4], scores [D], classes [D], valid [D]).
    """
    r, k1 = scores.shape
    k = k1 - 1
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)[:, :k]  # drop bg
    deltas = deltas.reshape(r, k, 4).astype(jnp.float32)

    # class-specific decoded boxes: [R, K, 4]
    def decode_class(d):
        return decode_boxes(proposals, d, weights=BOX_REG_WEIGHTS)
    boxes_k = jax.vmap(decode_class, in_axes=1, out_axes=1)(deltas)
    hh, ww = image_hw
    boxes_k = jnp.stack([
        jnp.clip(boxes_k[..., 0], 0, ww), jnp.clip(boxes_k[..., 1], 0, hh),
        jnp.clip(boxes_k[..., 2], 0, ww), jnp.clip(boxes_k[..., 3], 0, hh),
    ], axis=-1)

    flat_boxes = boxes_k.reshape(r * k, 4)
    flat_scores = jnp.where(prop_valid[:, None], probs, 0.0).reshape(r * k)
    flat_classes = jnp.broadcast_to(jnp.arange(k)[None], (r, k)).reshape(-1)
    flat_scores = jnp.where(flat_scores > score_thresh, flat_scores, 0.0)

    # Cap the NMS candidate set: the greedy NMS builds an [N, N] IoU
    # matrix, and the full R*K flattened set (1000 proposals x 80 classes)
    # would need a 25 GB matrix. Detectron2 score-filters before NMS
    # (dynamic); the static-shape equivalent is a top-k cap, far above
    # max_det so behaviour matches for any realistic detection count.
    cap = min(2048, r * k)
    top_scores, top_idx = jax.lax.top_k(flat_scores, cap)
    cand_boxes = flat_boxes[top_idx]
    cand_classes = flat_classes[top_idx]

    # class-aware NMS via coordinate offset
    span = jnp.maximum(jnp.float32(max(image_hw)), jnp.max(cand_boxes)) + 1.0
    offset_boxes = cand_boxes + cand_classes[:, None].astype(jnp.float32) * span
    keep_idx, keep_scores, valid = nms(offset_boxes, top_scores, nms_thresh,
                                       max_det, score_threshold=score_thresh)
    return (cand_boxes[keep_idx], jnp.where(valid, top_scores[keep_idx], 0.0),
            cand_classes[keep_idx], valid)


def point_sample(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample feat [H, W, C] at normalized points [P, 2] in [0, 1]
    (grid_sample align_corners=False convention)."""
    h, w, _ = feat.shape
    ys = points[:, 1] * h - 0.5
    xs = points[:, 0] * w - 0.5
    return _bilinear_sample(feat, ys[None], xs[None])[0]   # [P, C]


def pointrend_refine(point_head: PointHead, variables, coarse_sel,
                     coarse_all, det_class, fine_feat, box,
                     num_subdivisions: int = 3,
                     points_per_step: int = 784):
    """PointRend subdivision inference for one instance: iteratively 2x
    upsample the selected-class mask and re-predict the ``points_per_step``
    most uncertain points with the point head.

    coarse_sel [M, M] selected-class logits (tracked for uncertainty and
    output); coarse_all [M, M, K] the coarse head's full per-class logits —
    D2's point head consumes ALL K coarse channels at each sampled point
    (projects/PointRend point_head), sampled from the coarse 28x28
    prediction, not the progressively refined map; det_class scalar int32;
    fine_feat [H, W, C] (P2, stride 4); box xyxy in image coords.
    Returns refined selected-class logits at M * 2^k resolution.
    """
    logits = coarse_sel
    x1, y1, x2, y2 = box
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    for _ in range(num_subdivisions):
        m = logits.shape[0]
        logits = jax.image.resize(logits, (m * 2, m * 2), method="linear")
        m2 = logits.shape[0]
        unc = -jnp.abs(logits)                       # most uncertain first
        flat = unc.reshape(-1)
        k = min(points_per_step, flat.shape[0])
        _, idx = jax.lax.top_k(flat, k)
        py = (idx // m2).astype(jnp.float32)
        px = (idx % m2).astype(jnp.float32)
        # normalized coords within the box -> image coords -> P2 normalized
        u = (px + 0.5) / m2
        v = (py + 0.5) / m2
        img_x = x1 + u * bw
        img_y = y1 + v * bh
        h, w, _ = fine_feat.shape
        pts = jnp.stack([img_x / (w * 4.0), img_y / (h * 4.0)], axis=1)
        # fine_feat is P2 (stride 4): normalize by image size = feat * 4
        fine = point_sample(fine_feat, pts)          # [k, C]
        coarse_pts = point_sample(coarse_all,
                                  jnp.stack([u, v], axis=1))      # [k, K]
        refined = point_head.apply(variables, fine[None],
                                   coarse_pts[None])[0]           # [k, K]
        cls_col = jnp.broadcast_to(det_class, (k,))[:, None]
        sel = jnp.take_along_axis(refined, cls_col, axis=1)[:, 0]
        logits = logits.reshape(-1).at[idx].set(sel).reshape(m2, m2)
    return logits
