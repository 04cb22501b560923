"""Generate the self-contained demo training/eval dataset under records/.

The reference's released checkpoints are unavailable in this environment
(zero egress), so the demo pipeline is driven by checkpoints trained
in-repo (VERDICT round-1 item 2). That needs (image, mask) groundtruth for
the bundled demo assets (/root/reference/assets/{img_exp,lake_exp} —
images only, no annotations ship with the reference).

Deterministic water-mask groundtruth, per image either:

- ``poly``: hand-specified water polygon(s) in normalized coordinates
  (minus exclusion polygons for foreground objects). For the near-static
  lake clip the frame-0 polygon is translated per frame by the camera
  shift estimated with cv2.phaseCorrelate.
- ``color``: seeded color model — RGB statistics over known-water boxes,
  Mahalanobis classification inside an ROI, morphological cleanup +
  largest component + small-hole fill.

Masks are written as palette PNGs (water = label 1, the reference's stage
contract, myutils/data.py:14) and are groundtruth *by fiat* for the demo
workflow: training overfits to them and the e2e tests measure IoU against
them.

Outputs (committed to the repo so training is reproducible):
  records/demo_train/JPEGImages/<seq>/*.jpg     (re-encoded copies)
  records/demo_train/Annotations/<seq>/*.png
  records/demo_train/train_imgs.txt
  records/demo_eval/lake/{frames,masks}/*       (8-frame lake clip GT)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")   # host-only script

import cv2  # noqa: E402
from PIL import Image  # noqa: E402

from vfloodnet_tpu.utils import save_seg_mask  # noqa: E402

ASSETS = "/root/reference/assets"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records")

# flood0: brown flood water below the hedge line; the wading person is
# excluded (alamy letterbox bars / watermark strip outside the polygon).
FLOOD0_WATER = [(0.05, 0.45), (0.95, 0.40), (0.95, 0.92), (0.05, 0.92)]
FLOOD0_PERSON = [(0.36, 0.30), (0.62, 0.30), (0.72, 0.48), (0.67, 0.74),
                 (0.35, 0.74), (0.30, 0.60), (0.29, 0.45)]

# lake frame 0: water band between the far-shore treeline and the grass
# bank; the person + sign pole stand *in* the water and are deliberately
# kept as water (their pixels are part of the water band for the demo GT
# convention — consistent between training and eval).
LAKE_WATER = [(0.0, 0.335), (1.0, 0.315), (1.0, 0.865), (0.60, 0.935),
              (0.25, 0.92), (0.0, 0.895)]

# flood1: seeded color model (works well — water is uniformly brown).
FLOOD1_COLOR = dict(seeds=[(0.60, 0.85, 0.05, 0.95),
                           (0.42, 0.50, 0.30, 0.60)],
                    roi=(0.38, 1.0, 0.0, 1.0), thres=3.2)


def poly_mask(shape, polys, holes=()) -> np.ndarray:
    h, w = shape[:2]
    m = np.zeros((h, w), np.uint8)
    for poly in polys:
        pts = np.array([[int(x * w), int(y * h)] for x, y in poly], np.int32)
        cv2.fillPoly(m, [pts], 1)
    for poly in holes:
        pts = np.array([[int(x * w), int(y * h)] for x, y in poly], np.int32)
        cv2.fillPoly(m, [pts], 0)
    return m


def color_mask(img: np.ndarray, seeds, roi, thres: float,
               hole_frac: float = 0.01) -> np.ndarray:
    """Seeded color-model water mask. img uint8 RGB [H, W, 3]."""
    h, w = img.shape[:2]
    flat = img.astype(np.float64).reshape(-1, 3)
    maha = np.full(h * w, np.inf)
    for seed in seeds:
        y0, y1, x0, x1 = (int(seed[0] * h), int(seed[1] * h),
                          int(seed[2] * w), int(seed[3] * w))
        pix = img[y0:y1, x0:x1].reshape(-1, 3).astype(np.float64)
        mu = pix.mean(axis=0)
        cov = np.cov(pix.T) + np.eye(3) * 10.0
        icov = np.linalg.inv(cov)
        d = flat - mu
        maha = np.minimum(maha, np.sqrt(np.einsum("ij,jk,ik->i", d, icov, d)))
    m = (maha < thres).reshape(h, w).astype(np.uint8)
    ry0, ry1, rx0, rx1 = roi
    box = np.zeros_like(m)
    box[int(ry0 * h):int(ry1 * h), int(rx0 * w):int(rx1 * w)] = 1
    m &= box
    kernel = np.ones((7, 7), np.uint8)
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel, iterations=2)
    m = cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel)
    n, labels = cv2.connectedComponents(m, 8)
    if n > 2:
        sizes = np.bincount(labels.ravel())
        sizes[0] = 0
        m = (labels == sizes.argmax()).astype(np.uint8)
    # fill only small enclosed holes; large holes are genuine foreground
    inv = (1 - m).astype(np.uint8)
    n, labels = cv2.connectedComponents(inv, 4)
    border = np.unique(np.concatenate(
        [labels[0], labels[-1], labels[:, 0], labels[:, -1]]))
    sizes = np.bincount(labels.ravel(), minlength=n)
    for lab in range(1, n):
        if lab not in border and sizes[lab] < hole_frac * h * w:
            m[labels == lab] = 1
    return m


def frame_shift(ref_gray: np.ndarray, gray: np.ndarray):
    """Camera translation (dx, dy) in pixels of `gray` relative to `ref`."""
    (dx, dy), _ = cv2.phaseCorrelate(ref_gray.astype(np.float32),
                                     gray.astype(np.float32))
    return dx, dy


def shifted_poly(poly, dx_frac, dy_frac):
    return [(x + dx_frac, y + dy_frac) for x, y in poly]


def main():
    train_root = os.path.join(OUT, "demo_train")
    eval_root = os.path.join(OUT, "demo_eval", "lake")

    def emit_train(seq, stem, img, mask):
        img_dir = os.path.join(train_root, "JPEGImages", seq)
        mask_dir = os.path.join(train_root, "Annotations", seq)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        Image.fromarray(img).save(os.path.join(img_dir, stem + ".jpg"),
                                  quality=92)
        save_seg_mask(mask, os.path.join(mask_dir, stem + ".png"))

    # --- stills -----------------------------------------------------------
    img0 = np.asarray(Image.open(
        os.path.join(ASSETS, "img_exp/flood0.jpg")).convert("RGB"))
    m0 = poly_mask(img0.shape, [FLOOD0_WATER], holes=[FLOOD0_PERSON])
    emit_train("img_exp", "flood0", img0, m0)
    print(f"flood0: water fraction {m0.mean():.3f}")

    img1 = np.asarray(Image.open(
        os.path.join(ASSETS, "img_exp/flood1.jpg")).convert("RGB"))
    m1 = color_mask(img1, **FLOOD1_COLOR)
    emit_train("img_exp", "flood1", img1, m1)
    print(f"flood1: water fraction {m1.mean():.3f}")

    # --- lake clip --------------------------------------------------------
    frames = [np.asarray(Image.open(
        os.path.join(ASSETS, f"lake_exp/{i}.jpg")).convert("RGB"))
        for i in range(8)]
    small = [cv2.resize(cv2.cvtColor(f, cv2.COLOR_RGB2GRAY), (270, 480))
             for f in frames]
    fdir = os.path.join(eval_root, "frames")
    mdir = os.path.join(eval_root, "masks")
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)
    for i, img in enumerate(frames):
        dx, dy = (0.0, 0.0) if i == 0 else frame_shift(small[0], small[i])
        poly = shifted_poly(LAKE_WATER, dx / small[i].shape[1],
                            dy / small[i].shape[0])
        mask = poly_mask(img.shape, [poly])
        Image.fromarray(img).save(os.path.join(fdir, f"{i}.jpg"), quality=92)
        save_seg_mask(mask, os.path.join(mdir, f"{i}.png"))
        if i == 0:
            emit_train("lake_exp", "0", img, mask)
        print(f"lake {i}: shift ({dx:+.1f},{dy:+.1f})px, "
              f"water fraction {mask.mean():.3f}")

    with open(os.path.join(train_root, "train_imgs.txt"), "w") as f:
        f.write("img_exp\nlake_exp\n")
    print("wrote", train_root, "and", eval_root)


if __name__ == "__main__":
    main()
