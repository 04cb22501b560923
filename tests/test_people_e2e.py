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
