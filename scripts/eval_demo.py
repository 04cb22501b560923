"""Evaluate the trained demo checkpoints on the bundled demo assets.

Prints per-image IoU for the image model (training stills — overfit
sanity — AND held-out augmented variants, see ``eval_image_holdout``) and
per-frame propagation IoU for the video model on the 8-frame lake clip vs
the committed GT (records/demo_eval), then regenerates the trained-weights
golden (tests/golden/demo_lake_golden.npz) used by tests/test_demo_e2e.py.

Held-out structure (VERDICT round-2 next #5): image training only ever saw
epoch seeds < ~1e5, so augmented variants drawn at epoch >= 1e6 are
guaranteed-unseen draws of the SAME transform stack (jitter/affine/crop);
the video model trains on synthetic clips from the 3 stills, so real lake
frames 1-7 are themselves held-out inputs (only frame 0 was trained on).

Run after scripts/train_demo_checkpoints.py.
"""

from __future__ import annotations

import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VFLOOD_EVAL_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL = os.path.join(REPO, "records", "demo_eval", "lake")
TRAIN = os.path.join(REPO, "records", "demo_train")
GOLDEN = os.path.join(REPO, "tests", "golden", "demo_lake_golden.npz")


def iou(a, b):
    a = a > 0
    b = b > 0
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


def eval_image():
    from vfloodnet_tpu.models.linknet import load_linknet
    from vfloodnet_tpu.pipelines.image_seg import run_image_segmentation
    from vfloodnet_tpu.utils import load_mask

    model, variables = load_linknet(None)
    out = os.path.join(REPO, "output", "demo_eval")
    ious = {}
    for img_path in sorted(glob(os.path.join(TRAIN, "JPEGImages", "*",
                                             "*.jpg"))):
        seq = os.path.basename(os.path.dirname(img_path))
        stem = os.path.splitext(os.path.basename(img_path))[0]
        gt = load_mask(os.path.join(TRAIN, "Annotations", seq, stem + ".png"))
        results = run_image_segmentation(img_path, "eval_img", out,
                                         model=model, variables=variables)
        pred = load_mask(results[0][0])
        ious[f"{seq}/{stem}"] = iou(pred, gt)
    for k, v in ious.items():
        print(f"image IoU {k}: {v:.4f}")
    return ious


def eval_image_holdout(n_variants: int = 4):
    """Held-out image accuracy: never-seen augmentation draws (epoch seeds
    >= 1e6) of the demo stills, evaluated with the pipeline's forward +
    threshold + largest-CC cleanup at the 320px training operating point."""
    import jax.numpy as jnp

    from vfloodnet_tpu.data import WaterImageDataset
    from vfloodnet_tpu.models.linknet import load_linknet
    from vfloodnet_tpu.pipelines.video_seg import host_largest_cc

    model, variables = load_linknet(None)
    apply = jax.jit(lambda img: model.apply(variables, img))
    ds = WaterImageDataset("train_offline", TRAIN, input_size=320)
    ious = {}
    for idx in range(len(ds)):
        for v in range(n_variants):
            img, gt = ds.get(idx, epoch=1_000_000 + v)
            prob = np.asarray(apply(jnp.asarray(img)[None]))[0, ..., 0]
            pred = host_largest_cc((prob > 0.5).astype(np.uint8))
            ious[f"still{idx}/heldout{v}"] = iou(pred, gt)
    for k, v in ious.items():
        print(f"held-out image IoU {k}: {v:.4f}")
    vals = np.array(list(ious.values()))
    print(f"held-out image IoU mean: {vals.mean():.4f}, "
          f"min: {vals.min():.4f}")
    return ious


def eval_video(downsample=240):
    """240px operating point matches training + tests/test_demo_e2e.py
    (the golden must be generated at the same operating point)."""
    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.pipelines.loaders import load_afb_urr
    from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
    from vfloodnet_tpu.utils import load_mask

    model, variables = load_afb_urr(None)
    frames = sorted(glob(os.path.join(EVAL, "frames", "*.jpg")),
                    key=lambda p: int(os.path.splitext(
                        os.path.basename(p))[0]))
    masks = [load_mask(os.path.join(EVAL, "masks",
                                    os.path.splitext(
                                        os.path.basename(p))[0] + ".png"))
             for p in frames]
    from PIL import Image
    imgs = [np.asarray(Image.open(p).convert("RGB"), np.uint8)
            for p in frames]

    fb = FeatureBank(obj_n=2, memory_budget=250_000)
    eng = VideoSegEngine(model, variables, fb, downsample=downsample,
                         postprocess="host")
    state = eng.bootstrap(imgs[0], masks[0])
    ious = []
    preds = []
    from vfloodnet_tpu.pipelines.video_seg import host_largest_cc
    for i, img in enumerate(imgs[1:]):
        state, lab = eng.step(state, img, i + 1)
        pred = host_largest_cc(eng.fetch_label(lab))
        preds.append(pred)
        ious.append(iou(pred, masks[i + 1]))
        print(f"video frame {i + 1}: IoU {ious[-1]:.4f}")
    print(f"video mean IoU: {np.mean(ious):.4f}, min: {np.min(ious):.4f}")

    # trained-weights golden: store small-res predictions for regression
    import cv2
    small = np.stack([cv2.resize(p, (128, 72) if p.shape[0] < p.shape[1]
                                 else (72, 128),
                                 interpolation=cv2.INTER_NEAREST)
                      for p in preds])
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, labels=small,
                        ious=np.asarray(ious, np.float32))
    print("golden written:", GOLDEN)
    return ious


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("image", "all"):
        eval_image()
    if what in ("holdout", "image", "all"):
        eval_image_holdout()
    if what in ("video", "all"):
        eval_video()
