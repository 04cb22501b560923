"""Region Proposal Network (Flax, NHWC, static shapes).

Same contract as Detectron2's RPN over FPN levels P2-P6: one 3x3 conv trunk,
per-anchor objectness + box deltas, per-level pre-NMS top-k, delta decode,
clip, NMS(0.7), global top-N proposals. All output sizes are static; absent
proposals carry valid=False.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.nms import nms

# Detectron2 FPN RPN defaults: one size per level, 3 aspect ratios.
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECT_RATIOS = (0.5, 1.0, 2.0)


def generate_anchors(h: int, w: int, stride: int, size: int,
                     ratios: Sequence[float] = ASPECT_RATIOS) -> jnp.ndarray:
    """Anchor boxes [h*w*A, 4] xyxy centred on each cell."""
    ys = (jnp.arange(h) + 0.5) * stride
    xs = (jnp.arange(w) + 0.5) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    anchors = []
    area = float(size * size)
    for r in ratios:
        aw = (area / r) ** 0.5
        ah = aw * r
        anchors.append(jnp.stack([cx - aw / 2, cy - ah / 2,
                                  cx + aw / 2, cy + ah / 2], axis=-1))
    return jnp.stack(anchors, axis=2).reshape(-1, 4)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 scale_clamp: float = 4.135) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to anchors (Detectron2 Box2BoxTransform
    semantics)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    wx, wy, ww, wh = weights
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      deltas[:, 2] / ww, deltas[:, 3] / wh)
    dw = jnp.clip(dw, -scale_clamp, scale_clamp)
    dh = jnp.clip(dh, -scale_clamp, scale_clamp)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


class RPNHead(nn.Module):
    num_anchors: int = len(ASPECT_RATIOS)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), padding=1,
                       dtype=self.dtype, name="conv")
        obj_head = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                           name="objectness")
        box_head = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                           name="deltas")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(obj_head(t))
            deltas.append(box_head(t))
        return logits, deltas


class RPN(nn.Module):
    pre_nms_topk: int = 1000   # per level, test-time
    post_nms_topk: int = 1000
    nms_thresh: float = 0.7
    dtype: Any = jnp.float32

    def setup(self):
        self.head = RPNHead(dtype=self.dtype)

    def raw(self, feats: Sequence[jnp.ndarray]):
        """Per-level (objectness logits, box deltas) — the trainer's view
        (losses assign anchor targets outside the module)."""
        return self.head(feats)

    def __call__(self, feats: Sequence[jnp.ndarray], image_hw: Tuple[int, int]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """feats: P2..P6 ([1, H, W, C] each). Returns (proposals
        [post_nms_topk, 4], scores, valid)."""
        logits, deltas = self.head(feats)

        strides = [4, 8, 16, 32, 64]
        all_boxes, all_scores = [], []
        for lvl, (lg, dl) in enumerate(zip(logits, deltas)):
            _, h, w, a = lg.shape
            anchors = generate_anchors(h, w, strides[lvl], ANCHOR_SIZES[lvl])
            scores = lg.reshape(-1).astype(jnp.float32)
            dl = dl.reshape(-1, 4).astype(jnp.float32)
            k = min(self.pre_nms_topk, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            boxes = decode_boxes(anchors[top_idx], dl[top_idx])
            hh, ww = image_hw
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, ww), jnp.clip(boxes[:, 1], 0, hh),
                jnp.clip(boxes[:, 2], 0, ww), jnp.clip(boxes[:, 3], 0, hh),
            ], axis=1)
            all_boxes.append(boxes)
            all_scores.append(top_scores)

        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        # drop degenerate boxes
        ok = ((boxes[:, 2] - boxes[:, 0]) > 1e-3) & \
             ((boxes[:, 3] - boxes[:, 1]) > 1e-3)
        scores = jnp.where(ok, scores, -jnp.inf)
        keep_idx, keep_scores, valid = nms(boxes, scores, self.nms_thresh,
                                           self.post_nms_topk)
        return boxes[keep_idx], keep_scores, valid
