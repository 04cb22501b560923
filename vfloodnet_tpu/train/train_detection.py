"""GeneralizedRCNN trainer (RPN + box + mask losses, single-image steps).

The reference consumes released Detectron2 COCO checkpoints
(estimation/object_detection.py:16-25) and never trains; this trainer
exists so the detection chain can run with REAL weights in this
environment — a tiny RCNN variant (RCNNConfig.blocks) is trained on
synthetic stop-sign scenes (data/detection_dataset.py) until the full
detect -> octagon fit -> homography -> pole march -> depth path works
end-to-end without injected fake detectors.

Loss structure follows Detectron2's defaults:
- RPN: balanced sigmoid BCE on anchor objectness (pos IoU>=0.7 /
  neg IoU<0.3 / ignore between, plus best-anchor-per-GT forcing), L1 on
  positive-anchor box deltas, transform weights (1,1,1,1).
- ROI box head: softmax CE over K+1 (background = index K, matching
  heads.box_inference which drops the LAST column), class-specific L1 on
  foreground deltas with weights (10,10,5,5).
- Mask head: per-class BCE at 28x28 on foreground ROIs; targets cropped
  from the GT instance masks with the same ROIAlign the features use.

Target assignment is pure JAX with static shapes (fixed GT capacity,
fixed ROI count); proposals mix top-scoring decoded anchors, the GT boxes
themselves, and uniform random boxes so the background column trains from
step one (NMS-free training proposals — the inference path keeps its NMS).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.detection.heads import BOX_REG_WEIGHTS
from ..models.detection.meta import GeneralizedRCNN, RCNNConfig
from ..models.detection.rpn import ANCHOR_SIZES, decode_boxes, \
    generate_anchors
from ..ops.roi_align import roi_align

RPN_STRIDES = (4, 8, 16, 32, 64)


@dataclasses.dataclass
class DetectionTrainConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-4
    image_size: int = 320
    roi_n: int = 128           # ROIs per step (gt + topk + random)
    roi_topk: int = 64
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    roi_fg_iou: float = 0.5
    mask_weight: float = 1.0
    keypoint_weight: float = 1.0
    keypoint_rois: int = 16    # fg ROIs fed to the keypoint head per step
    epochs: int = 8
    seed: int = 0


class DetectionTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a [N, 4], b [M, 4] xyxy -> IoU [N, M]."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def encode_boxes(gt: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Inverse of rpn.decode_boxes: (dx, dy, dw, dh) targets."""
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    gw = jnp.maximum(gt[:, 2] - gt[:, 0], 1e-6)
    gh = jnp.maximum(gt[:, 3] - gt[:, 1], 1e-6)
    gx = gt[:, 0] + gw / 2
    gy = gt[:, 1] + gh / 2
    wx, wy, ww, wh = weights
    return jnp.stack([wx * (gx - ax) / aw, wy * (gy - ay) / ah,
                      ww * jnp.log(gw / aw), wh * jnp.log(gh / ah)], axis=1)


def level_anchors(image_size: int) -> jnp.ndarray:
    """All-level anchors [A, 4] in the flatten order rpn_raw uses."""
    out = []
    for stride, size in zip(RPN_STRIDES, ANCHOR_SIZES):
        side = -(-image_size // stride)
        out.append(generate_anchors(side, side, stride, size))
    return jnp.concatenate(out)


def assign_rpn_targets(anchors: jnp.ndarray, gt: jnp.ndarray,
                       gt_valid: jnp.ndarray, pos_iou: float,
                       neg_iou: float):
    """-> (labels [A] in {-1 ignore, 0 neg, 1 pos}, target deltas [A, 4])."""
    iou = pairwise_iou(anchors, gt) * gt_valid[None, :]
    best = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)
    labels = jnp.where(best >= pos_iou, 1, jnp.where(best < neg_iou, 0, -1))
    # force the best anchor of each valid GT positive (handles small
    # objects that never reach pos_iou)
    best_anchor = jnp.argmax(iou, axis=0)                     # [G]
    # scatter-max: invalid GTs contribute -10 which never beats any label
    labels = labels.at[best_anchor].max(
        jnp.where(gt_valid > 0, 1, -10))
    deltas = encode_boxes(gt[arg], anchors)
    return labels, deltas


def assign_roi_targets(rois: jnp.ndarray, gt: jnp.ndarray,
                       gt_classes: jnp.ndarray, gt_valid: jnp.ndarray,
                       num_classes: int, fg_iou: float):
    """-> (cls target [R] with background = num_classes, fg mask [R],
    matched gt index [R], target deltas [R, 4])."""
    iou = pairwise_iou(rois, gt) * gt_valid[None, :]
    best = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)
    fg = best >= fg_iou
    cls = jnp.where(fg, gt_classes[arg], num_classes)
    deltas = encode_boxes(gt[arg], rois, BOX_REG_WEIGHTS)
    return cls, fg, arg, deltas


def _training_proposals(key, anchors, logits_flat, deltas_flat, gt, gt_valid,
                        image_size: int, roi_n: int, topk: int):
    """gt boxes + top-k decoded anchors + uniform random boxes -> [R, 4]."""
    scores = jax.lax.stop_gradient(logits_flat)
    dl = jax.lax.stop_gradient(deltas_flat)
    _, idx = jax.lax.top_k(scores, topk)
    top_boxes = decode_boxes(anchors[idx], dl[idx])
    top_boxes = jnp.clip(top_boxes, 0, image_size)

    g = gt.shape[0]
    rand_n = roi_n - topk - g
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (rand_n, 2), minval=0.0,
                            maxval=image_size * 0.8)
    wh = jax.random.uniform(k2, (rand_n, 2), minval=image_size * 0.05,
                            maxval=image_size * 0.5)
    rand_boxes = jnp.concatenate(
        [xy, jnp.minimum(xy + wh, image_size)], axis=1)

    # invalid GT slots become harmless full-image boxes (they match no GT
    # above fg_iou, so they train as background)
    gt_boxes = jnp.where(gt_valid[:, None] > 0, gt,
                         jnp.asarray([0.0, 0.0, image_size, image_size]))
    return jnp.concatenate([gt_boxes, top_boxes, rand_boxes])


def detection_loss(model: GeneralizedRCNN, variables, cfg,
                   anchors: jnp.ndarray, key, image, gt_boxes, gt_classes,
                   gt_masks, gt_valid, gt_keypoints=None):
    """Full single-image loss. image [S, S, 3] BGR 0..255.
    ``gt_keypoints`` [G, K, 3] (x, y, vis) enables the keypoint heatmap
    loss when the model config has ``with_keypoints``."""
    tc = cfg
    mc = model.cfg
    s = image.shape[0]

    pyramid = model.apply(variables, image, method=model.features)
    logits, deltas = model.apply(variables, pyramid, method=model.rpn_raw)
    logits_flat = jnp.concatenate(
        [l.reshape(-1) for l in logits]).astype(jnp.float32)
    deltas_flat = jnp.concatenate(
        [d.reshape(-1, 4) for d in deltas]).astype(jnp.float32)

    # ---- RPN losses ------------------------------------------------------
    labels, tgt_deltas = assign_rpn_targets(
        anchors, gt_boxes, gt_valid, tc.rpn_pos_iou, tc.rpn_neg_iou)
    pos = (labels == 1).astype(jnp.float32)
    neg = (labels == 0).astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(
        logits_flat, pos)
    rpn_obj = 0.5 * (jnp.sum(bce * pos) / jnp.maximum(pos.sum(), 1.0)
                     + jnp.sum(bce * neg) / jnp.maximum(neg.sum(), 1.0))
    l1 = jnp.abs(deltas_flat - tgt_deltas).sum(axis=1)
    rpn_box = jnp.sum(l1 * pos) / jnp.maximum(pos.sum(), 1.0)

    # ---- ROI head losses -------------------------------------------------
    rois = _training_proposals(key, anchors, logits_flat, deltas_flat,
                               gt_boxes, gt_valid, s, tc.roi_n, tc.roi_topk)
    cls_t, fg, arg, roi_deltas_t = assign_roi_targets(
        rois, gt_boxes, gt_classes, gt_valid, mc.num_classes, tc.roi_fg_iou)
    fg_f = fg.astype(jnp.float32)

    scores, box_deltas = model.apply(variables, pyramid, rois,
                                     method=model.box_apply)
    cls_loss = optax.softmax_cross_entropy_with_integer_labels(
        scores.astype(jnp.float32), cls_t).mean()

    r = rois.shape[0]
    bd = box_deltas.reshape(r, mc.num_classes, 4).astype(jnp.float32)
    cls_idx = jnp.clip(cls_t, 0, mc.num_classes - 1)
    bd_sel = jnp.take_along_axis(bd, cls_idx[:, None, None].repeat(4, -1),
                                 axis=1)[:, 0]
    reg_l1 = jnp.abs(bd_sel - roi_deltas_t).sum(axis=1)
    reg_loss = jnp.sum(reg_l1 * fg_f) / jnp.maximum(fg_f.sum(), 1.0)

    loss = rpn_obj + rpn_box + cls_loss + reg_loss
    aux = {"rpn_obj": rpn_obj, "rpn_box": rpn_box, "cls": cls_loss,
           "reg": reg_loss}

    if mc.with_masks:
        mask_logits = model.apply(variables, pyramid, rois,
                                  method=model.mask_apply)  # [R, 28, 28, K]
        side = mask_logits.shape[1]
        sel = jnp.take_along_axis(
            mask_logits, cls_idx[:, None, None, None], axis=-1)[..., 0]
        # targets: ROIAlign crops of the matched GT instance mask
        mask_hw_g = jnp.moveaxis(gt_masks, 0, -1)            # [S, S, G]
        crops = roi_align(mask_hw_g, rois, pooled=side)      # [R, s, s, G]
        tgt = jnp.take_along_axis(
            crops, arg[:, None, None, None], axis=-1)[..., 0]
        tgt = (tgt > 0.5).astype(jnp.float32)
        mbce = optax.sigmoid_binary_cross_entropy(
            sel.astype(jnp.float32), tgt).mean(axis=(1, 2))
        mask_loss = jnp.sum(mbce * fg_f) / jnp.maximum(fg_f.sum(), 1.0)
        loss = loss + tc.mask_weight * mask_loss
        aux["mask"] = mask_loss

    if mc.with_keypoints and gt_keypoints is not None:
        # Detectron2 keypoint_rcnn_loss semantics (roi_heads/keypoint_head
        # .py): per-VISIBLE-keypoint softmax cross-entropy over the S*S
        # heatmap grid of each fg ROI, normalized by the visible-keypoint
        # count. Static shapes: the keypoint head runs on the first
        # ``keypoint_rois`` fg ROIs (stable argsort puts the GT-box ROIs
        # first).
        kr = min(tc.keypoint_rois, tc.roi_n)
        sel = jnp.argsort(-fg_f)[:kr]                   # stable: gt first
        kp_rois = rois[sel]
        heat = model.apply(variables, pyramid, kp_rois,
                           method=model.keypoint_apply)  # [kr, S, S, K]
        side = heat.shape[1]
        kps = gt_keypoints[arg[sel]]                    # [kr, K, 3]
        x1, y1 = kp_rois[:, 0:1], kp_rois[:, 1:2]
        bw = jnp.maximum(kp_rois[:, 2:3] - x1, 1e-3)
        bh = jnp.maximum(kp_rois[:, 3:4] - y1, 1e-3)
        ix = jnp.floor((kps[..., 0] - x1) / bw * side).astype(jnp.int32)
        iy = jnp.floor((kps[..., 1] - y1) / bh * side).astype(jnp.int32)
        # Detectron2 keypoints_to_heatmap clamps keypoints lying exactly on
        # the ROI's right/bottom edge into the last bin rather than marking
        # them invisible (structures/keypoints.py); without this, edge
        # keypoints silently contribute no loss.
        ix = jnp.where(ix == side, side - 1, ix)
        iy = jnp.where(iy == side, side - 1, iy)
        inside = (ix >= 0) & (ix < side) & (iy >= 0) & (iy < side)
        vis = (kps[..., 2] > 0) & inside & fg[sel][:, None]
        tgt = jnp.clip(iy, 0, side - 1) * side + jnp.clip(ix, 0, side - 1)
        logits = jnp.moveaxis(heat.reshape(kr, side * side, -1), -1, 1)
        kce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), tgt)            # [kr, K]
        visf = vis.astype(jnp.float32)
        kp_loss = jnp.sum(kce * visf) / jnp.maximum(jnp.sum(visf), 1.0)
        loss = loss + tc.keypoint_weight * kp_loss
        aux["kp"] = kp_loss

    return loss, aux


def init_detection_train_state(model: GeneralizedRCNN, variables,
                               cfg: DetectionTrainConfig
                               ) -> Tuple[DetectionTrainState,
                                          optax.GradientTransformation]:
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    params = variables["params"]
    return DetectionTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    ), tx


def make_detection_train_step(model: GeneralizedRCNN,
                              tx: optax.GradientTransformation,
                              cfg: DetectionTrainConfig) -> Callable:
    anchors = level_anchors(cfg.image_size)

    def step(state: DetectionTrainState, image, gt_boxes, gt_classes,
             gt_masks, gt_valid, gt_keypoints=None):
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return detection_loss(model, variables, cfg, anchors, key,
                                  image, gt_boxes, gt_classes, gt_masks,
                                  gt_valid, gt_keypoints)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss, aux

    return jax.jit(step, donate_argnums=0)


def tiny_stopsign_config(image_size: int = 320) -> RCNNConfig:
    """Synthetic-trainable RCNN: 1-block stages, full COCO class space so
    the trained checkpoint drops into the standard stop-sign pipeline
    (class id 11), plain mask head (PointRend refinement is exercised by
    the inference-parity tests instead)."""
    return RCNNConfig(blocks=(1, 1, 1, 1), num_classes=80,
                      with_masks=True, with_pointrend=False,
                      score_thresh=0.5, post_nms_topk=256,
                      max_detections=16, test_short_side=image_size,
                      test_max_side=image_size * 2)


def tiny_people_config(image_size: int = 320) -> RCNNConfig:
    """Synthetic-trainable person detector for the people-depth chain.
    The reference's people detector IS Keypoint R-CNN
    (estimation/object_detection.py:21-25,269-281), so the tiny variant
    trains the keypoint head too (heatmap CE on the synthetic scenes'
    COCO-17 geometry); the depth path consumes the person BOXES
    (:191-243) and the e2e test asserts keypoint geometry."""
    return RCNNConfig(blocks=(1, 1, 1, 1), num_classes=80,
                      with_masks=True, with_pointrend=False,
                      with_keypoints=True,
                      score_thresh=0.5, post_nms_topk=256,
                      max_detections=16, test_short_side=image_size,
                      test_max_side=image_size * 2)
