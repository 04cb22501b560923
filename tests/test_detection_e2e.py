"""End-to-end stop-sign depth estimation with a TRAINED detector.

Runs the reference's full chain (estimation/object_detection.py:260-398):
detector -> instance mask -> octagon fit -> homography -> pole march ->
depth, with NO injected fake detectors — the tiny synthetic-trained RCNN
(scripts/train_demo_detector.py) is a real model in the loop. Skips until
that checkpoint exists.
"""

import os
from glob import glob

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "records", "checkpoints", "stopsign_tiny")
EVAL = os.path.join(REPO, "records", "demo_eval", "stopsign")

def _best():
    npz = os.path.join(CKPT, "best.npz")
    return npz if os.path.exists(npz) else os.path.join(CKPT, "best")


needs_ckpt = pytest.mark.skipif(
    not os.path.exists(_best()),
    reason="tiny stop-sign detector not trained")


@needs_ckpt
def test_trained_detector_detects_stopsign():
    from vfloodnet_tpu.data.detection_dataset import render_stopsign_scene
    from vfloodnet_tpu.models.detection import load_default_detector
    from vfloodnet_tpu.train.train_detection import pairwise_iou
    import jax.numpy as jnp

    det = load_default_detector("stopsign", _best())
    rng = np.random.default_rng(77)
    sc = render_stopsign_scene(rng, size=320)
    inst = det(sc["image"].astype(np.uint8))
    assert len(inst) >= 1, "no detections on a clean synthetic scene"
    sign = [i for i in range(len(inst)) if int(inst.classes[i]) == 11]
    assert sign, f"no stop-sign class among {inst.classes.tolist()}"
    iou = float(pairwise_iou(jnp.asarray(inst.boxes[sign[:1]]),
                             jnp.asarray(sc["boxes"][:1]))[0, 0])
    assert iou > 0.5, f"detection IoU vs GT too low: {iou}"
    assert inst.masks is not None and inst.masks[sign[0]].sum() > 0


@needs_ckpt
def test_stopsign_depth_chain_end_to_end(tmp_path):
    """est_by_obj_detection with the trained detector on staged scenes
    produces a nonzero depth (VERDICT round-1 item 6 'done' criterion)."""
    from vfloodnet_tpu.pipelines.object_detection import est_by_obj_detection

    frames = sorted(glob(os.path.join(EVAL, "frames", "*.png")))
    masks = [os.path.join(EVAL, "masks", os.path.basename(p))
             for p in frames]
    if not frames:
        pytest.skip("e2e scenes not staged (scripts/train_demo_detector.py)")

    out = est_by_obj_detection(frames, masks, str(tmp_path), "stopsign",
                               det_model_path=_best())
    rows = [ln.split("\t") for ln in open(out).read().strip().splitlines()]
    assert rows, "no depth rows written"
    depths = [float(r[2]) for r in rows]
    assert any(d > 0 for d in depths), \
        f"no positive depth from the full chain: {depths}"
