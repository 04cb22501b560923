"""People depth-estimation path with synthetic detector + mesh regressor."""

import numpy as np

from vfloodnet_tpu.pipelines.object_detection import (Instances,
                                                      est_by_obj_detection)
from vfloodnet_tpu.utils import save_seg_mask


def test_est_by_obj_detection_people(tmp_path):
    import cv2
    h, w = 240, 320
    img = np.full((h, w, 3), 128, np.uint8)
    img_path = str(tmp_path / "frame.png")
    cv2.imwrite(img_path, img)

    # water covers the bottom 40% of the image
    water = np.zeros((h, w), np.uint8)
    water[int(h * 0.6):, :] = 1
    mask_path = str(tmp_path / "mask.png")
    save_seg_mask(water, mask_path)

    # person standing centred, feet at y=0.9h, head at y=0.2h
    box = np.array([[140.0, 48.0, 180.0, 216.0]])

    def detector(_img):
        return Instances(boxes=box, scores=np.array([0.95]),
                         classes=np.array([0]))

    v = 431
    template = np.stack([np.zeros(v), np.linspace(-0.9, 0.9, v)], axis=1)

    def regressor(crop):
        # predicted vertices = canonical standing pose filling the crop
        return template

    out = est_by_obj_detection([img_path], [mask_path], str(tmp_path),
                               "people", detector=detector,
                               mesh_regressor=regressor,
                               template_3d_path=None)
    rows = open(out).read().strip().split("\n")
    assert len(rows) == 1
    name, ratio, depth = rows[0].split("\t")
    ratio = float(ratio)
    # water at 0.6h; crop spans roughly the person box -> submerged fraction
    # should be meaningful and bounded
    assert 0.05 <= ratio <= 0.8
    np.testing.assert_allclose(float(depth), ratio * 175.4, rtol=1e-3)
