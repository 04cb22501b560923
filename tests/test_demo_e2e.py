"""End-to-end demo-asset tests with TRAINED checkpoints (no random init).

Requires the in-repo demo checkpoints (scripts/train_demo_checkpoints.py)
and the demo GT (scripts/make_demo_dataset.py). Replaces random-init smoke
coverage with accuracy-bearing assertions (VERDICT round-1 item 2):

- image model segments its training stills to IoU >= threshold,
- video model propagates the lake clip from the frame-0 GT mask and every
  frame's mask matches the per-frame GT to IoU >= threshold,
- the propagation matches the trained-weights golden (regression).
"""

import os
from glob import glob

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "records", "checkpoints")
EVAL = os.path.join(REPO, "records", "demo_eval", "lake")
TRAIN = os.path.join(REPO, "records", "demo_train")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "demo_lake_golden.npz")

IMAGE_IOU_MIN = float(os.environ.get("VFLOOD_DEMO_IMAGE_IOU", "0.70"))
VIDEO_IOU_MIN = float(os.environ.get("VFLOOD_DEMO_VIDEO_IOU", "0.75"))

def _has_ckpt(kind):
    return (os.path.exists(os.path.join(CKPT, kind, "best.npz"))
            or os.path.isdir(os.path.join(CKPT, kind, "best")))


needs_image = pytest.mark.skipif(not _has_ckpt("image"),
                                 reason="demo image checkpoint not trained")
needs_video = pytest.mark.skipif(not _has_ckpt("video"),
                                 reason="demo video checkpoint not trained")


def _iou(a, b):
    a, b = a > 0, b > 0
    return np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)


@needs_image
def test_image_model_segments_demo_stills(tmp_path):
    from vfloodnet_tpu.models.linknet import load_linknet
    from vfloodnet_tpu.pipelines.image_seg import run_image_segmentation
    from vfloodnet_tpu.utils import load_mask

    model, variables = load_linknet(None)
    for img_path in sorted(glob(os.path.join(TRAIN, "JPEGImages", "*",
                                             "*.jpg"))):
        seq = os.path.basename(os.path.dirname(img_path))
        stem = os.path.splitext(os.path.basename(img_path))[0]
        gt = load_mask(os.path.join(TRAIN, "Annotations", seq,
                                    stem + ".png"))
        results = run_image_segmentation(img_path, "eval", str(tmp_path),
                                         model=model, variables=variables)
        pred = load_mask(results[0][0])
        score = _iou(pred, gt)
        assert score >= IMAGE_IOU_MIN, (img_path, score)


@needs_image
def test_image_model_generalizes_to_heldout_augments():
    """Held-out accuracy (VERDICT round-2 next #5): augmentation draws at
    epoch seeds >= 1e6 are guaranteed-unseen (training schedules stay below
    ~1e5), evaluated with the pipeline's forward + threshold + largest-CC
    at the 320px training operating point. Threshold from measurement
    (scripts/eval_demo.py holdout): 12 held-out variants scored mean
    0.986 / min 0.955 IoU; 0.85 leaves numeric-platform margin."""
    import jax
    import jax.numpy as jnp

    from vfloodnet_tpu.data import WaterImageDataset
    from vfloodnet_tpu.models.linknet import load_linknet
    from vfloodnet_tpu.pipelines.video_seg import host_largest_cc

    model, variables = load_linknet(None)
    apply = jax.jit(lambda img: model.apply(variables, img))
    ds = WaterImageDataset("train_offline", TRAIN, input_size=320)
    for idx in range(len(ds)):
        img, gt = ds.get(idx, epoch=1_000_000 + idx)
        prob = np.asarray(apply(jnp.asarray(img)[None]))[0, ..., 0]
        pred = host_largest_cc((prob > 0.5).astype(np.uint8))
        score = _iou(pred, gt)
        assert score >= 0.85, (idx, score)


@needs_video
def test_video_model_propagates_lake_clip():
    from PIL import Image

    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.pipelines.loaders import load_afb_urr
    from vfloodnet_tpu.pipelines.video_seg import (VideoSegEngine,
                                                   host_largest_cc)
    from vfloodnet_tpu.utils import load_mask

    model, variables = load_afb_urr(None)
    frames = sorted(glob(os.path.join(EVAL, "frames", "*.jpg")),
                    key=lambda p: int(os.path.splitext(
                        os.path.basename(p))[0]))
    masks = [load_mask(os.path.join(
        EVAL, "masks", os.path.splitext(os.path.basename(p))[0] + ".png"))
        for p in frames]
    imgs = [np.asarray(Image.open(p).convert("RGB"), np.uint8)
            for p in frames]

    fb = FeatureBank(obj_n=2, memory_budget=65_536)
    # 240px operating point: matches the training resolution and keeps the
    # CPU runtime practical; the production default is 480.
    eng = VideoSegEngine(model, variables, fb, downsample=240,
                         postprocess="host")
    state = eng.bootstrap(imgs[0], masks[0])
    preds, ious = [], []
    for i, img in enumerate(imgs[1:]):
        state, lab = eng.step(state, img, i + 1)
        pred = host_largest_cc(eng.fetch_label(lab))
        preds.append(pred)
        ious.append(_iou(pred, masks[i + 1]))
    assert min(ious) >= VIDEO_IOU_MIN, ious

    # regression vs the trained-weights golden (downsampled masks)
    if os.path.exists(GOLDEN):
        import cv2
        want = np.load(GOLDEN)["labels"]
        got = np.stack([cv2.resize(p, want.shape[1:][::-1],
                                   interpolation=cv2.INTER_NEAREST)
                        for p in preds])
        agreement = (got == want).mean()
        assert agreement > 0.97, agreement
