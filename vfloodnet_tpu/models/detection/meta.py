"""Generalized R-CNN assembly: backbone -> FPN -> RPN -> ROI heads.

JAX counterpart of the reference's two Detectron2 predictors
(estimation/object_detection.py:16-25): PointRend instance segmentation
(ResNeXt-101-32x8d, stop signs) and Keypoint R-CNN (ResNet-101, people).
Inference only (the reference uses released COCO weights). Static shapes:
fixed proposal/detection counts with validity masks; one compiled graph per
input resolution bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.roi_align import multilevel_roi_align, roi_align
from .backbone import DetectionResNet
from .fpn import FPN
from .heads import (BoxHead, CoarseMaskHead, KeypointHead, MaskHead,
                    PointHead, box_inference, pointrend_refine)
from .rpn import RPN

# Detectron2 caffe-style preprocessing (BGR, mean-subtract, no std scaling)
PIXEL_MEAN_BGR = (103.530, 116.280, 123.675)
STRIDES = (4, 8, 16, 32)


@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    num_classes: int = 80
    groups: int = 1
    width_per_group: int = 64
    # backbone stage depths (R-101 default; small tuples give the tiny
    # synthetic-trainable variants used by train/train_detection.py)
    blocks: tuple = (3, 4, 23, 3)
    score_thresh: float = 0.5
    nms_thresh: float = 0.5
    max_detections: int = 100
    post_nms_topk: int = 1000
    with_masks: bool = False
    with_pointrend: bool = False
    with_keypoints: bool = False
    num_keypoints: int = 17
    # input resize (Detectron2 test default)
    test_short_side: int = 800
    test_max_side: int = 1333
    # jit-granularity of inference (see infer_front): the whole fused graph
    # crashes the TPU worker at full scale, and for the 80-class PointRend
    # config even the fused ROI-heads half does. 0 = one jit (tiny
    # variants), 1 = front/back (Keypoint R-CNN scale), 2 = front/boxes/
    # mask-tail (X-101 PointRend scale). Each level was bisected on the
    # real chip: every listed granularity runs, one level coarser crashes.
    jit_split: int = 0


class GeneralizedRCNN(nn.Module):
    cfg: RCNNConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = DetectionResNet(
            blocks=tuple(self.cfg.blocks),
            groups=self.cfg.groups, width_per_group=self.cfg.width_per_group,
            dtype=self.dtype)
        self.fpn = FPN(dtype=self.dtype)
        self.rpn = RPN(post_nms_topk=self.cfg.post_nms_topk, dtype=self.dtype)
        self.box_head = BoxHead(self.cfg.num_classes, dtype=self.dtype)
        if self.cfg.with_masks:
            if self.cfg.with_pointrend:
                # D2 PointRend pairs a coarse 7x7 FC head with the point head
                self.mask_head = CoarseMaskHead(self.cfg.num_classes,
                                                dtype=self.dtype)
            else:
                self.mask_head = MaskHead(self.cfg.num_classes,
                                          dtype=self.dtype)
        if self.cfg.with_pointrend:
            self.point_head = PointHead(self.cfg.num_classes, dtype=self.dtype)
        if self.cfg.with_keypoints:
            self.keypoint_head = KeypointHead(self.cfg.num_keypoints,
                                              dtype=self.dtype)

    def __call__(self, image_bgr: jnp.ndarray):
        """image_bgr [H, W, 3] float (0..255 BGR, already resized + padded to
        a multiple of 32). Returns a dict of static-shape detections."""
        h, w, _ = image_bgr.shape
        feats, proposals, prop_valid = self.infer_front(image_bgr)
        return self.infer_back(feats, proposals, prop_valid, (h, w))

    def infer_front(self, image_bgr: jnp.ndarray):
        """Backbone + FPN + RPN half of inference. Split out because the
        WHOLE fused graph reproducibly crashes the TPU worker at the
        full-scale operating point (800px, 1000 proposals, R-101/X-101)
        while each half compiles and runs fine — build_detector jits the
        halves separately when ``cfg.jit_split`` (two dispatches/image)."""
        x = (image_bgr - jnp.asarray(PIXEL_MEAN_BGR))[None]
        c2, c3, c4, c5 = self.backbone(x.astype(self.dtype))
        pyramid = self.fpn((c2, c3, c4, c5))                 # P2..P6
        proposals, _, prop_valid = self.rpn(pyramid,
                                            image_bgr.shape[:2])
        return tuple(p[0] for p in pyramid[:4]), proposals, prop_valid

    def infer_back(self, feats, proposals, prop_valid, image_hw):
        """ROI heads half of inference (see :meth:`infer_front`)."""
        det = self.infer_boxes(feats, proposals, prop_valid, image_hw)
        return self.infer_tail(feats, *det)

    def infer_boxes(self, feats, proposals, prop_valid, image_hw):
        """Box head + class-aware NMS (jit_split level 2 piece)."""
        feats = list(feats)
        box_feats = multilevel_roi_align(feats, proposals, STRIDES, pooled=7)
        scores, deltas = self.box_head(box_feats)
        return box_inference(
            proposals, prop_valid, scores, deltas, image_hw,
            self.cfg.score_thresh, self.cfg.nms_thresh,
            self.cfg.max_detections)

    def infer_tail(self, feats, boxes, det_scores, det_classes, det_valid):
        """Mask/PointRend-coarse/keypoint heads on the final detections
        (jit_split level 2 piece)."""
        feats = list(feats)
        out = {"boxes": boxes, "scores": det_scores, "classes": det_classes,
               "valid": det_valid}

        if self.cfg.with_masks:
            mask_feats = multilevel_roi_align(feats, boxes, STRIDES,
                                              pooled=14)
            mask_logits = self.mask_head(mask_feats)         # [D, 28, 28, K]
            sel = jnp.take_along_axis(
                mask_logits, det_classes[:, None, None, None], axis=-1)[..., 0]
            out["mask_logits"] = sel                         # [D, 28, 28]
            if self.cfg.with_pointrend:
                out["p2"] = feats[0]
                out["coarse_all"] = mask_logits              # [D, 28, 28, K]

        if self.cfg.with_keypoints:
            kp_feats = multilevel_roi_align(feats, boxes, STRIDES, pooled=14)
            heat = self.keypoint_head(kp_feats)              # [D, 56, 56, K]
            out["keypoint_heatmaps"] = heat

        return out

    # ---- trainer-facing pieces (losses assign targets outside the module,
    # train/train_detection.py) --------------------------------------------
    def features(self, image_bgr: jnp.ndarray):
        """image -> FPN pyramid [(P2, stride), ...]."""
        x = (image_bgr - jnp.asarray(PIXEL_MEAN_BGR))[None]
        c2, c3, c4, c5 = self.backbone(x.astype(self.dtype))
        return self.fpn((c2, c3, c4, c5))

    def rpn_raw(self, pyramid):
        return self.rpn.raw([p[0] for p in pyramid])

    def box_apply(self, pyramid, rois):
        feats = multilevel_roi_align([p[0] for p in pyramid[:4]], rois,
                                     STRIDES, pooled=7)
        return self.box_head(feats)

    def mask_apply(self, pyramid, rois):
        feats = multilevel_roi_align([p[0] for p in pyramid[:4]], rois,
                                     STRIDES, pooled=14)
        return self.mask_head(feats)

    def keypoint_apply(self, pyramid, rois):
        """ROI keypoint heatmaps [R, 56, 56, K] for the trainer (the
        reference's people detector IS Keypoint R-CNN,
        estimation/object_detection.py:21-25)."""
        feats = multilevel_roi_align([p[0] for p in pyramid[:4]], rois,
                                     STRIDES, pooled=14)
        return self.keypoint_head(feats)

    def init_all(self, image_bgr: jnp.ndarray):
        """__call__ plus a dummy point-head invocation so ``init`` creates
        the COMPLETE parameter tree: the PointRend refinement runs outside
        __call__ (in :func:`build_detector`), so a plain init would omit
        ``point_head`` and checkpoint restore would drop its weights."""
        out = self.__call__(image_bgr)
        if self.cfg.with_pointrend:
            fine = jnp.zeros((1, 4, 256), self.dtype)
            coarse = jnp.zeros((1, 4, self.cfg.num_classes), self.dtype)
            self.point_head(fine, coarse)
        return out


def preprocess_bgr(img_bgr: np.ndarray, short: int, max_side: int
                   ) -> Tuple[np.ndarray, float]:
    """Detectron2 test-time resize (shortest edge, capped) + pad to /32.
    Returns (padded float image, scale)."""
    import cv2
    h, w = img_bgr.shape[:2]
    scale = short / min(h, w)
    if max(h, w) * scale > max_side:
        scale = max_side / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(img_bgr, (nw, nh)).astype(np.float32)
    ph = -(-nh // 32) * 32
    pw = -(-nw // 32) * 32
    out = np.zeros((ph, pw, 3), np.float32)
    out[:nh, :nw] = resized
    return out, scale


def paste_mask(mask_logit: np.ndarray, box: np.ndarray, out_hw,
               thresh: float = 0.5) -> np.ndarray:
    """Paste a 28x28 (or refined MxM) mask logit into the full image."""
    import cv2
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2 = min(x2, out_hw[1])
    y2 = min(y2, out_hw[0])
    out = np.zeros(out_hw, np.uint8)
    if x2 <= x1 or y2 <= y1:
        return out
    prob = 1.0 / (1.0 + np.exp(-mask_logit))
    resized = cv2.resize(prob, (x2 - x1, y2 - y1))
    out[y1:y2, x1:x2] = (resized > thresh).astype(np.uint8)
    return out


def build_detector(cfg: RCNNConfig, variables, refine_points: bool = True,
                   dtype=jnp.float32) -> Callable:
    """Wrap a GeneralizedRCNN into the host-level Detector contract used by
    the estimation pipeline (numpy in / Instances out).

    ``dtype=jnp.bfloat16`` runs the conv/matmul path at full MXU rate
    (params stay f32; box/NMS arithmetic is f32 either way). Default f32
    matches the reference's Detectron2 inference numerics."""
    from ...pipelines.object_detection import Instances

    model = GeneralizedRCNN(cfg, dtype=dtype)

    use_pointrend = cfg.with_pointrend and refine_points

    def _refine(vs, out):
        if use_pointrend and "mask_logits" in out:
            # PointRend subdivision refinement per detection (28 -> 224),
            # vmapped over the fixed detection count.
            point_head = PointHead(cfg.num_classes, name="point_head")
            ph_vars = {"params": vs["params"]["point_head"]} \
                if "point_head" in vs.get("params", {}) else None
            if ph_vars is not None:
                p2 = out.pop("p2")
                coarse_all = out.pop("coarse_all")

                def refine_one(coarse_sel, call, box, cls):
                    return pointrend_refine(point_head, ph_vars, coarse_sel,
                                            call, cls, p2, box,
                                            num_subdivisions=3)

                out["mask_logits"] = jax.vmap(refine_one)(
                    out["mask_logits"], coarse_all, out["boxes"],
                    out["classes"])
        out.pop("p2", None)
        out.pop("coarse_all", None)
        return out

    def _apply(vs, img):
        # NOTE: vs is a jit ARGUMENT, not a closure constant — closed-over
        # weights get baked into the HLO as literals, which blows past the
        # remote-compile relay's request-size limit for X-101-sized models.
        return _refine(vs, model.apply(vs, img))

    def _apply_front(vs, img):
        return model.apply(vs, img, method=model.infer_front)

    def _apply_back(vs, feats, proposals, prop_valid, hw):
        out = model.apply(vs, feats, proposals, prop_valid, hw,
                          method=model.infer_back)
        return _refine(vs, out)

    variables = jax.device_put(variables)   # upload once, reuse per call

    if int(cfg.jit_split) >= 2:
        # Three dispatches per image (X-101 PointRend scale: even the
        # fused ROI-heads half crashes the TPU worker — bisected on chip).
        front_fn = jax.jit(_apply_front)
        boxes_fn = jax.jit(
            lambda vs, f, p, pv, hw: model.apply(
                vs, f, p, pv, hw, method=model.infer_boxes),
            static_argnums=(4,))
        tail_fn = jax.jit(
            lambda vs, f, *det: _refine(
                vs, model.apply(vs, f, *det, method=model.infer_tail)))

        def run(vs, padded):
            feats, proposals, pv = front_fn(vs, padded)
            det = boxes_fn(vs, feats, proposals, pv,
                           tuple(padded.shape[:2]))
            return tail_fn(vs, feats, *det)
    elif cfg.jit_split:
        # Two dispatches per image: the single fused inference graph
        # reproducibly crashes the TPU worker at the full-scale operating
        # point while both halves run fine (see infer_front docstring).
        front_fn = jax.jit(_apply_front)
        back_fn = jax.jit(_apply_back, static_argnums=(4,))

        def run(vs, padded):
            feats, proposals, pv = front_fn(vs, padded)
            return back_fn(vs, feats, proposals, pv,
                           tuple(padded.shape[:2]))
    else:
        apply_fn = jax.jit(_apply)
        run = apply_fn

    def detector(img_bgr: np.ndarray) -> Instances:
        padded, scale = preprocess_bgr(img_bgr, cfg.test_short_side,
                                       cfg.test_max_side)
        out = jax.device_get(run(variables, jax.device_put(padded)))
        valid = out["valid"]
        boxes = out["boxes"] / scale
        n = int(valid.sum())
        h, w = img_bgr.shape[:2]
        masks = None
        if "mask_logits" in out:
            masks = np.stack([
                paste_mask(out["mask_logits"][i], boxes[i], (h, w))
                for i in range(len(boxes))])
        keypoints = None
        if "keypoint_heatmaps" in out:
            keypoints = _heatmaps_to_keypoints(out["keypoint_heatmaps"],
                                               boxes)
        return Instances(boxes=boxes[:n], scores=out["scores"][:n],
                         classes=out["classes"][:n],
                         masks=None if masks is None else masks[:n],
                         keypoints=None if keypoints is None else keypoints[:n])

    return detector


def _heatmaps_to_keypoints(heatmaps: np.ndarray, boxes: np.ndarray
                           ) -> np.ndarray:
    """[D, S, S, K] heatmaps -> [D, K, 3] (x, y, score) in image coords."""
    d, s, _, k = heatmaps.shape
    flat = heatmaps.reshape(d, s * s, k)
    idx = flat.argmax(axis=1)                          # [D, K]
    score = flat.max(axis=1)
    ys = (idx // s + 0.5) / s
    xs = (idx % s + 0.5) / s
    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    bw = np.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
    bh = np.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
    return np.stack([x1 + xs * bw, y1 + ys * bh, score], axis=-1)


def stopsign_rcnn_config() -> RCNNConfig:
    """PointRend X-101-32x8d instance segmentation (stop signs)."""
    return RCNNConfig(groups=32, width_per_group=8, score_thresh=0.5,
                      with_masks=True, with_pointrend=True, jit_split=2)


def keypoint_rcnn_config() -> RCNNConfig:
    """Keypoint R-CNN R-101 (people)."""
    return RCNNConfig(groups=1, width_per_group=64, score_thresh=0.7,
                      num_classes=1, with_keypoints=True, jit_split=1)


def _sidecar_config(path: str) -> Optional[RCNNConfig]:
    """RCNNConfig from a ``rcnn_config.json`` sidecar next to (or inside)
    a checkpoint dir — lets trained non-default variants (e.g. the tiny
    synthetic-trained stop-sign detector, train/train_detection.py) drop
    into the standard CLI path."""
    import json
    import os

    for cand in (os.path.join(path, "rcnn_config.json"),
                 os.path.join(os.path.dirname(path.rstrip("/")),
                              "rcnn_config.json")):
        if os.path.exists(cand):
            with open(cand) as f:
                d = json.load(f)
            if "blocks" in d:
                d["blocks"] = tuple(d["blocks"])
            return RCNNConfig(**d)
    return None


def load_default_detector(opt: str, model_path: Optional[str] = None):
    """Build the detector for --opt {stopsign, people}. Loads converted
    weights when available; random init with a warning otherwise (smoke
    mode — real runs need converted Detectron2 COCO weights, or the
    synthetic-trained tiny checkpoint from scripts/train_demo_detector.py)."""
    import os
    import warnings

    # default checkpoint locations are repo-root-relative (CWD-independent,
    # like pipelines/loaders.py _RECORDS)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    default_paths = {
        "stopsign": os.path.join(repo, "records", "pointrend_x101_tpu"),
        "people": os.path.join(repo, "records", "keypoint_r101_tpu")}
    path = model_path or default_paths.get(opt)
    # bundled synthetic-trained fallback; prefers the flat best.npz
    # fast-load file over an orbax dir (core/checkpoint.py)
    if (not model_path or not os.path.exists(model_path)) and \
            not os.path.exists(path):
        kind = {"stopsign": "stopsign_tiny", "people": "people_tiny"}[opt]
        base = os.path.join(repo, "records", "checkpoints", kind)
        for demo in (os.path.join(base, "best.npz"),
                     os.path.join(base, "best")):
            if os.path.exists(demo):
                path = demo
                break

    cfg = (_sidecar_config(path) if path else None) or (
        stopsign_rcnn_config() if opt == "stopsign" else
        keypoint_rcnn_config())
    model = GeneralizedRCNN(cfg)

    # init_all also touches the point head (refinement runs outside
    # __call__); jitted because eager flax init would run the whole graph
    # op-by-op — minutes on CPU.
    init = jax.jit(lambda key, img: model.init(key, img,
                                               method=model.init_all))
    if path and path.endswith(".npz") and os.path.exists(path):
        # flat fast-load file: no dummy init (saves a cold compile)
        from ...core.checkpoint import load_flat_npz
        variables = load_flat_npz(path)
    elif path and os.path.isdir(path):
        from ...core.checkpoint import restore_checkpoint
        dummy = init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
        variables = restore_checkpoint(path, target=dummy)
    else:
        warnings.warn(f"No detector checkpoint at {path!r}; random init "
                      "(smoke mode).")
        variables = init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
    return build_detector(cfg, variables)
