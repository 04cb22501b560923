"""Reference-object detection + water depth quantification.

Capability parity with estimation/object_detection.py (reference C14):

- **stopsign**: detect stop signs, fit an octagon to the instance mask,
  estimate the homography from the canonical sign template, project the pole,
  march along the pole until the water mask is hit, depth = submerged ratio x
  215.9 cm.
- **people**: detect people, crop to 224x224 together with the matching water
  mask crop, regress the body mesh, classify projected vertices above/below
  water via mask lookup, boundary from medians, depth = ratio x 175.4 cm.

Redesign notes (TPU-first):
- the detector and the body-mesh regressor are injected callables backed by
  JAX models (:mod:`vfloodnet_tpu.models.detection`,
  :mod:`vfloodnet_tpu.models.metro`) — the reference's METRO subprocess +
  file IPC (object_detection.py:319-325) becomes an in-process call;
- the homography is the first-class DLT op (ops/homography.py), the pole
  march is vectorised sampling instead of a pixel-stepping python loop
  (object_detection.py:155-161);
- per-image geometry stays on host (numpy): it is O(vertices), not O(pixels).
"""

from __future__ import annotations

import json
import os
import warnings
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import (OBJECT_COLORS, PEOPLE_BOX_SCORE_MIN, PEOPLE_META,
                           STOPSIGN_COCO_CLASS, STOPSIGN_META, WATER_LABEL_ID)
from ..ops.homography import find_homography, perspective_transform
from ..utils import add_overlay, load_mask


@dataclass
class Instances:
    """Detector output for one image (all numpy, host-side)."""
    boxes: np.ndarray        # [N, 4] xyxy
    scores: np.ndarray       # [N]
    classes: np.ndarray      # [N] int
    masks: Optional[np.ndarray] = None      # [N, H, W] uint8
    keypoints: Optional[np.ndarray] = None  # [N, K, 3]

    def __len__(self):
        return len(self.boxes)


Detector = Callable[[np.ndarray], Instances]
MeshRegressor = Callable[[np.ndarray], np.ndarray]  # [224,224,3]->[V,2] in [-1,1]


# --------------------------------------------------------------------------
# Stop-sign template (reference object_detection.py:65-102)
# --------------------------------------------------------------------------

def make_stopsign_template(pts_n: int = 8, plate_radius: float = 50.0,
                           plate_center=(150.0, 75.0)):
    """Canonical octagon + pole. Returns (plate_pts [8,2], pole_top [2],
    pole_bottom [2])."""
    step = 2.0 * np.pi / pts_n
    pos = step / 2.0
    pts = []
    for _ in range(pts_n):
        pts.append((plate_radius * np.cos(pos) + plate_center[0],
                    plate_radius * np.sin(pos) + plate_center[1]))
        pos += step
    plate = np.array(pts)
    plate_height = 2.0 * np.cos(step / 2.0) * plate_radius
    pole_len = plate_height / STOPSIGN_META["size_cm"] * \
        STOPSIGN_META["pole_height_cm"]
    pole_top = plate[1:3].mean(axis=0)
    pole_bottom = pole_top + np.array([0.0, pole_len])
    return plate, pole_top, pole_bottom


def fit_octagon(mask: np.ndarray) -> Optional[np.ndarray]:
    """Fit an 8-gon to the largest contour of a binary mask; vertices sorted
    by polar angle around the centroid (reference :114-132). Returns [8, 2]
    or None."""
    import cv2
    cnts, _ = cv2.findContours(mask.astype(np.uint8),
                               cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not cnts:
        return None
    cnt = max(cnts, key=cv2.contourArea)
    peri = cv2.arcLength(cnt, True)
    approx = cv2.approxPolyDP(cnt, 0.02 * peri, True)
    if approx.shape[0] != 8:
        return None
    x, y = approx[:, 0, 0].astype(np.float64), approx[:, 0, 1].astype(np.float64)
    xc, yc = x.mean(), y.mean()
    r = np.sqrt((x - xc) ** 2 + (y - yc) ** 2)
    ang = np.where((y - yc) > 0, np.arccos(np.clip((x - xc) / r, -1, 1)),
                   2 * np.pi - np.arccos(np.clip((x - xc) / r, -1, 1)))
    order = np.argsort(ang)
    return np.stack([x[order], y[order]], axis=1).astype(np.float32)


def march_pole_to_water(pole_top: np.ndarray, pole_bottom: np.ndarray,
                        water_mask: np.ndarray) -> Tuple[np.ndarray, float]:
    """Vectorised pole march: sample every integer step from top to bottom,
    return the first point whose mask value is water (reference :151-161).
    Returns (hit_point [2], submerged_ratio)."""
    length = float(np.linalg.norm(pole_bottom - pole_top))
    n = max(int(length), 1)
    direction = (pole_bottom - pole_top) / max(length, 1e-9)
    steps = np.arange(n)[:, None]
    pts = (pole_top[None] + direction[None] * steps).astype(int)   # [n, 2]
    h, w = water_mask.shape
    inside = ((pts[:, 0] > 0) & (pts[:, 1] > 0)
              & (pts[:, 0] < w) & (pts[:, 1] < h))
    vals = np.zeros(n, np.uint8)
    vals[inside] = water_mask[pts[inside, 1], pts[inside, 0]]
    # Stop at the image border like the reference's break (:157-158):
    # only consider hits before the first out-of-bounds sample.
    first_oob = np.argmax(~inside) if (~inside).any() else n
    hits = np.nonzero(vals[:first_oob] == WATER_LABEL_ID)[0]
    if hits.size == 0:
        return pole_bottom.astype(int), 0.0
    hit = pts[hits[0]]
    ratio = float(np.linalg.norm(hit - pole_bottom) / max(length, 1e-9))
    return hit, ratio


def waterdepth_by_stopsign(img: np.ndarray, instances: Instances,
                           water_mask: Optional[np.ndarray],
                           result_dir: str, img_name: str
                           ) -> Tuple[float, float]:
    """Returns (submerged_ratio, waterdepth_cm); (-1, -1) when no usable
    stop sign."""
    import cv2
    thickness = 6
    template_color = (0, 200, 0)
    submerged_color = (0, 0, 200)

    plate, pole_top, pole_bottom = make_stopsign_template()
    if water_mask is None:
        return -1.0, -1.0

    for i in range(len(instances)):
        if int(instances.classes[i]) != STOPSIGN_COCO_CLASS:
            continue
        if instances.masks is None:
            continue
        oct_pts = fit_octagon(instances.masks[i])
        if oct_pts is None:
            continue

        h = find_homography(plate, oct_pts)
        proj = perspective_transform(
            np.concatenate([plate, pole_top[None], pole_bottom[None]]), h)
        proj_plate = proj[:8].astype(int)
        proj_top, proj_bottom = proj[8], proj[9]

        hit, ratio = march_pole_to_water(proj_top, proj_bottom, water_mask)
        depth_cm = ratio * STOPSIGN_META["pole_height_cm"]

        viz = img.copy()
        for j in range(8):
            cv2.line(viz, tuple(proj_plate[j]), tuple(proj_plate[(j + 1) % 8]),
                     template_color, thickness)
        cv2.line(viz, tuple(proj_top.astype(int)),
                 tuple(proj_bottom.astype(int)), template_color, thickness)
        cv2.line(viz, tuple(hit.astype(int)),
                 tuple(proj_bottom.astype(int)), submerged_color, thickness)
        os.makedirs(result_dir, exist_ok=True)
        cv2.imwrite(os.path.join(result_dir, f"{img_name}_pred.png"), viz)

        # template + estimate canvases (reference :91-102, :166-184)
        water_color = (200, 0, 0)
        tmpl = np.full((300, 400, 3), 255, np.uint8)
        ipts = plate.astype(int)
        for j in range(8):
            cv2.line(tmpl, tuple(ipts[j]), tuple(ipts[(j + 1) % 8]),
                     template_color, thickness)
        t_top, t_bot = pole_top.astype(int), pole_bottom.astype(int)
        cv2.line(tmpl, tuple(t_top), tuple(t_bot), template_color, thickness)
        water_y = int(pole_top[1] + (1.0 - ratio)
                      * (pole_bottom[1] - pole_top[1]))
        cv2.line(tmpl, (t_top[0], water_y), tuple(t_bot), submerged_color,
                 thickness)
        cv2.line(tmpl, (100, water_y), (300, water_y), water_color, thickness)
        cv2.imwrite(os.path.join(result_dir, f"{img_name}_template.png"), tmpl)

        est = np.full_like(img, 255)
        for j in range(8):
            cv2.line(est, tuple(proj_plate[j]),
                     tuple(proj_plate[(j + 1) % 8]), template_color,
                     thickness)
        cv2.line(est, tuple(proj_top.astype(int)),
                 tuple(proj_bottom.astype(int)), template_color, thickness)
        cv2.line(est, tuple(hit.astype(int)),
                 tuple(proj_bottom.astype(int)), submerged_color, thickness)
        cv2.imwrite(os.path.join(result_dir, f"{img_name}_est.png"), est)
        return ratio, depth_cm

    return -1.0, -1.0


# --------------------------------------------------------------------------
# People path
# --------------------------------------------------------------------------

def crop_person(img: np.ndarray, water_mask: np.ndarray, box,
                scale_ratio: float = 1.5, out_size: int = 224):
    """Square crop around a person box, clamped to the image (reference
    :196-227), resized to 224 with the matching mask crop."""
    import cv2
    img_h, img_w = img.shape[:2]
    x1, y1, x2, y2 = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    radius = min(min(img_h, img_w),
                 scale_ratio * max(x2 - x1, y2 - y1)) / 2
    left, right = int(cx - radius), int(cx + radius)
    top, bottom = int(cy - radius), int(cy + radius)
    if left < 0:
        right -= left
        left = 0
    if right >= img_w:
        left -= (right - img_w)
        right = img_w
    if top < 0:
        bottom -= top
        top = 0
    if bottom >= img_h:
        top -= (bottom - img_h)
        bottom = img_h
    crop = cv2.resize(img[top:bottom, left:right], (out_size, out_size))
    mask_crop = cv2.resize(water_mask[top:bottom, left:right],
                           (out_size, out_size),
                           interpolation=cv2.INTER_NEAREST)
    return crop, mask_crop


def predict_boundary(under_y: np.ndarray, above_y: np.ndarray
                     ) -> Optional[int]:
    """Water boundary from vertex medians (reference predict_boundary
    :246-257)."""
    if above_y.size == 0 or under_y.size == 0:
        return None
    above_bottom = np.median(np.sort(above_y)[-30:])
    under_sel = under_y[under_y > above_bottom]
    if under_sel.size == 0:
        return None
    under_top = np.median(np.sort(under_sel)[:10])
    return int((above_bottom + under_top) // 2)


def waterdepth_by_people(crop_mask: np.ndarray, pred_2d: np.ndarray,
                         template_2d: np.ndarray, resolution: int = 224,
                         result_dir: Optional[str] = None,
                         img_name: str = "") -> Optional[float]:
    """Submerge ratio from projected mesh vertices vs. the canonical
    standing template (reference :337-387). pred_2d / template_2d are [V, 2]
    in [-1, 1]. With ``result_dir``, writes the reference's
    ``*_est.png`` / ``*_template.png`` vertex canvases (:353-386)."""
    pred = np.clip(((pred_2d + 1) * resolution / 2).astype(int), 0,
                   resolution - 1)
    template = np.clip(((template_2d + 1) * resolution / 2).astype(int), 0,
                       resolution - 1)
    t_top = template[:, 1].min()
    t_height = max(template[:, 1].max() - t_top, 1)

    labels = crop_mask[pred[:, 1], pred[:, 0]]
    under = labels == WATER_LABEL_ID
    boundary = predict_boundary(template[under, 1], template[~under, 1])

    if result_dir:
        import cv2
        os.makedirs(result_dir, exist_ok=True)
        est = np.full((resolution, resolution, 3), 255, np.uint8)
        tmpl = np.full((resolution, resolution, 3), 255, np.uint8)
        for j in range(pred.shape[0]):
            color = [0, 0, 200] if under[j] else [0, 200, 0]
            cv2.circle(est, tuple(pred[j]), 0, color, 2)
            cv2.circle(tmpl, (template[j][0], template[j][1]), 0,
                       [0, 0, 200] if under[j] else [0, 200, 0], 2)
        if boundary is not None:
            cv2.line(tmpl, (resolution // 4, int(boundary)),
                     (3 * resolution // 4, int(boundary)), (200, 0, 0), 2)
        cv2.imwrite(os.path.join(result_dir, f"{img_name}_est.png"), est)
        cv2.imwrite(os.path.join(result_dir, f"{img_name}_template.png"),
                    tmpl)

    if boundary is None:
        return None
    return 1.0 - (boundary - t_top) / t_height


def est_by_obj_detection(img_list: Sequence[str],
                         water_mask_list: Sequence[str], out_dir: str,
                         opt: str, detector: Optional[Detector] = None,
                         mesh_regressor: Optional[MeshRegressor] = None,
                         template_3d_path: Optional[str] = None,
                         det_model_path: Optional[str] = None) -> str:
    """Depth estimation over a list of stills. Writes
    ``<out_dir>/waterdepth.txt`` rows (name, ratio, depth-cm) like the
    reference (:311-315, :389-398). Returns its path."""
    import cv2

    if detector is None:
        from ..models.detection import load_default_detector
        detector = load_default_detector(opt, det_model_path)

    result_dir = os.path.join(out_dir, "result")
    os.makedirs(result_dir, exist_ok=True)
    rows = []

    if opt == "stopsign":
        for img_path, mask_path in zip(img_list, water_mask_list):
            name = os.path.splitext(os.path.basename(img_path))[0]
            img = cv2.imread(img_path)
            water_mask = load_mask(mask_path) if os.path.exists(mask_path) \
                else None
            if water_mask is None:
                warnings.warn(f"missing water mask for {name}")
            inst = detector(img)
            ratio, depth = waterdepth_by_stopsign(img, inst, water_mask,
                                                  result_dir, name)
            rows.append((name, ratio, depth))

    elif opt == "people":
        if mesh_regressor is None:
            from ..models.metro import load_default_mesh_regressor
            mesh_regressor = load_default_mesh_regressor()
        template_2d = _load_template_3d(template_3d_path)
        for img_path, mask_path in zip(img_list, water_mask_list):
            name = os.path.splitext(os.path.basename(img_path))[0]
            img = cv2.imread(img_path)
            water_mask = load_mask(mask_path) if os.path.exists(mask_path) \
                else None
            if water_mask is None:
                warnings.warn(f"missing water mask for {name}")
                continue
            inst = detector(img)
            done = False
            for pi in range(len(inst)):
                if inst.scores[pi] < PEOPLE_BOX_SCORE_MIN:
                    continue
                crop, mask_crop = crop_person(img, water_mask, inst.boxes[pi])
                pred_2d = mesh_regressor(crop)
                ratio = waterdepth_by_people(mask_crop, pred_2d, template_2d,
                                             result_dir=result_dir,
                                             img_name=name)
                if ratio is not None:
                    depth = ratio * PEOPLE_META["man_height_cm"]
                    rows.append((name, ratio, depth))
                    done = True
                break
            if not done:
                print(f"No usable person detection in {name}. Skip.")
    else:
        raise NotImplementedError(opt)

    out_path = os.path.join(out_dir, "waterdepth.txt")
    with open(out_path, "w") as f:
        for name, ratio, depth in rows:
            f.write(f"{name}\t{ratio:.4f}\t{depth:.4f}\n")
    return out_path


def _load_template_3d(path: Optional[str]) -> np.ndarray:
    """Canonical standing-body projected vertices in [-1, 1] (reference
    records/template_3Dmesh.txt, object_detection.py:328-334). Falls back to
    a synthetic standing silhouette when the record file is absent."""
    if path and os.path.exists(path):
        with open(path) as f:
            return np.array(json.load(f))[:, :2]
    # Synthetic standing template: vertices spread over a vertical ellipse.
    rng = np.random.RandomState(0)
    v = 431
    y = np.linspace(-0.95, 0.95, v)
    x = 0.18 * np.sin(np.linspace(0, np.pi, v)) * rng.uniform(0.3, 1.0, v) \
        * np.sign(rng.randn(v))
    return np.stack([x, y], axis=1)
