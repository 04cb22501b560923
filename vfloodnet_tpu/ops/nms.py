"""Fixed-size non-maximum suppression (XLA-friendly).

Replaces Detectron2's CUDA NMS (used by the reference's PointRend / Keypoint
R-CNN predictors, estimation/object_detection.py:281) with a static-shape
iterative suppression: scores are sorted once, then a fori_loop of
``max_out`` steps picks the best remaining box and suppresses overlaps.
O(max_out * N) IoU work, fully jittable, no dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between [N, 4] and [M, 4] xyxy boxes."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int, score_threshold: float = 0.0
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static output size.

    Returns (keep_idx [max_out], keep_scores [max_out], valid [max_out]);
    suppressed/absent slots have valid == False and score == -inf.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)                     # [N, N]
    alive = scores > score_threshold

    def body(i, carry):
        alive, out_idx, out_score = carry
        s = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(s)
        best_score = s[best]
        ok = jnp.isfinite(best_score)
        out_idx = out_idx.at[i].set(jnp.where(ok, best, -1))
        out_score = out_score.at[i].set(jnp.where(ok, best_score, -jnp.inf))
        # suppress: the picked box and all overlaps above the threshold
        suppress = jnp.logical_or(iou[best] > iou_threshold,
                                  jnp.arange(n) == best)
        alive = jnp.where(ok, jnp.logical_and(alive, ~suppress), alive)
        return alive, out_idx, out_score

    out_idx = jnp.full((max_out,), -1, jnp.int32)
    out_score = jnp.full((max_out,), -jnp.inf, jnp.float32)
    _, out_idx, out_score = jax.lax.fori_loop(
        0, max_out, body, (alive, out_idx, out_score))
    valid = out_idx >= 0
    return jnp.maximum(out_idx, 0), out_score, valid


def batched_class_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                      classes: jnp.ndarray, iou_threshold: float,
                      max_out: int, score_threshold: float = 0.0):
    """Class-aware NMS via the coordinate-offset trick (boxes of different
    classes never overlap)."""
    span = jnp.max(boxes) + 1.0
    offset = classes.astype(boxes.dtype)[:, None] * span
    return nms(boxes + offset, scores, iou_threshold, max_out,
               score_threshold)
