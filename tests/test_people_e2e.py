"""People depth chain e2e with TRAINED weights: person detector -> crop ->
body-mesh regressor -> submerge ratio -> depth, no injected fakes (VERDICT
round-2 next #3).

Requires the synthetic-trained tiny person detector + bodymesh regressor
(scripts/train_people_chain.py) and staged scenes
(records/demo_eval/people). Mirrors the reference chain
estimation/object_detection.py:191-243,269-281,319-398 (released Keypoint
R-CNN / METRO weights there; synthetic-trained here — no egress).
"""

import os
from glob import glob

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DET = os.path.join(REPO, "records", "checkpoints", "people_tiny")
_MESH = os.path.join(REPO, "records", "checkpoints", "bodymesh")
SCENES = os.path.join(REPO, "records", "demo_eval", "people")

needs_models = pytest.mark.skipif(
    not (os.path.exists(os.path.join(_DET, "best.npz"))
         and os.path.exists(os.path.join(_MESH, "best.npz"))
         and glob(os.path.join(SCENES, "frames", "*.png"))),
    reason="people chain not trained / scenes not staged")


@needs_models
def test_people_chain_produces_real_depth(tmp_path):
    from vfloodnet_tpu.pipelines.object_detection import est_by_obj_detection

    img_list = sorted(glob(os.path.join(SCENES, "frames", "*.png")))
    mask_list = [os.path.join(SCENES, "masks",
                              os.path.basename(p)) for p in img_list]
    out_path = est_by_obj_detection(img_list, mask_list, str(tmp_path),
                                    "people")
    assert os.path.exists(out_path)
    rows = [ln.split("\t") for ln in open(out_path) if ln.strip()]
    depths = []
    for r in rows:
        try:
            depths.append(float(r[-1]))
        except ValueError:
            pass
    assert depths, f"no parsable depth rows in {out_path}: {rows}"
    assert any(np.isfinite(d) and d > 0 for d in depths), rows


def _kp_enabled():
    import json
    cfg = os.path.join(_DET, "rcnn_config.json")
    if not os.path.exists(cfg):
        return False
    return bool(json.load(open(cfg)).get("with_keypoints"))


@needs_models
@pytest.mark.skipif(not _kp_enabled(),
                    reason="people_tiny trained without keypoint head")
def test_people_detector_keypoint_geometry():
    """The trained tiny Keypoint R-CNN must produce plausible COCO-17
    keypoints on a staged scene: all inside (a slightly dilated) person
    box, nose above the hips, hips above the ankles (VERDICT r3 next #4 —
    the reference's people detector is Keypoint R-CNN,
    estimation/object_detection.py:21-25)."""
    from vfloodnet_tpu.models.detection.meta import load_default_detector

    detector = load_default_detector("people")

    import cv2
    img = cv2.imread(sorted(glob(os.path.join(SCENES, "frames",
                                              "*.png")))[0])
    inst = detector(img)
    assert inst.keypoints is not None and len(inst.keypoints) >= 1
    # strongest person detection
    i = int(np.argmax(inst.scores))
    box = inst.boxes[i]
    kp = inst.keypoints[i]                    # [17, 3] (x, y, score)
    w, h = box[2] - box[0], box[3] - box[1]
    assert np.all(kp[:, 0] >= box[0] - 0.15 * w)
    assert np.all(kp[:, 0] <= box[2] + 0.15 * w)
    assert np.all(kp[:, 1] >= box[1] - 0.15 * h)
    assert np.all(kp[:, 1] <= box[3] + 0.15 * h)
    nose_y = kp[0, 1]
    hip_y = 0.5 * (kp[11, 1] + kp[12, 1])
    ankle_y = 0.5 * (kp[15, 1] + kp[16, 1])
    assert nose_y < hip_y < ankle_y, (nose_y, hip_y, ankle_y)
