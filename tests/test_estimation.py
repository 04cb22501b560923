"""Estimation geometry + hydrograph tests with synthetic data."""

import os

import numpy as np
import pytest

from vfloodnet_tpu.core.config import site_profile, STOPSIGN_META
from vfloodnet_tpu.ops.homography import (find_homography,
                                          perspective_transform,
                                          warp_perspective_nearest)
from vfloodnet_tpu.pipelines.object_detection import (
    Instances, est_by_obj_detection, fit_octagon, make_stopsign_template,
    march_pole_to_water, predict_boundary, waterdepth_by_people)


def test_find_homography_exact():
    rng = np.random.RandomState(0)
    h_true = np.array([[1.2, 0.1, 30], [-0.05, 0.9, 10], [1e-4, -2e-4, 1.0]])
    src = rng.rand(8, 2) * 100
    dst = perspective_transform(src, h_true)
    h_est = find_homography(src, dst)
    np.testing.assert_allclose(h_est, h_true / h_true[2, 2], rtol=1e-6,
                               atol=1e-6)
    back = perspective_transform(src, h_est)
    np.testing.assert_allclose(back, dst, atol=1e-6)


def test_warp_perspective_identity():
    img = (np.random.RandomState(1).rand(20, 30) * 255).astype(np.uint8)
    out = warp_perspective_nearest(img, np.eye(3))
    np.testing.assert_array_equal(out, img)


def test_stopsign_template_geometry():
    plate, top, bottom = make_stopsign_template()
    assert plate.shape == (8, 2)
    # regular octagon: all edges equal
    edges = np.linalg.norm(plate - np.roll(plate, -1, axis=0), axis=1)
    np.testing.assert_allclose(edges, edges[0], rtol=1e-6)
    # pole length proportional to real-world ratio
    plate_h = plate[:, 1].max() - plate[:, 1].min()
    pole_len = bottom[1] - top[1]
    np.testing.assert_allclose(
        pole_len / plate_h,
        STOPSIGN_META["pole_height_cm"] / STOPSIGN_META["size_cm"], rtol=1e-6)


def test_fit_octagon_on_synthetic_mask():
    import cv2
    plate, _, _ = make_stopsign_template()
    mask = np.zeros((200, 300), np.uint8)
    cv2.fillPoly(mask, [plate.astype(np.int32)], 1)
    pts = fit_octagon(mask)
    assert pts is not None and pts.shape == (8, 2)
    # every fitted vertex is near some template vertex
    d = np.linalg.norm(pts[:, None] - plate[None], axis=-1).min(axis=1)
    assert d.max() < 6.0


def test_march_pole_to_water():
    mask = np.zeros((100, 50), np.uint8)
    mask[60:, :] = 1
    top = np.array([25.0, 10.0])
    bottom = np.array([25.0, 90.0])
    hit, ratio = march_pole_to_water(top, bottom, mask)
    assert hit[1] == 60
    np.testing.assert_allclose(ratio, 30.0 / 80.0, atol=0.02)
    # no water -> ratio 0
    _, r0 = march_pole_to_water(top, bottom, np.zeros_like(mask))
    assert r0 == 0.0


def test_predict_boundary():
    above = np.arange(50, 100).astype(np.float64)   # above-water ys
    under = np.arange(110, 150).astype(np.float64)  # deeper ys
    b = predict_boundary(under, above)
    assert 95 <= b <= 120
    assert predict_boundary(np.array([]), above) is None


def test_waterdepth_by_people_half_submerged():
    res = 224
    # template: vertical line of vertices
    v = 431
    template = np.stack([np.zeros(v), np.linspace(-0.9, 0.9, v)], axis=1)
    pred = template.copy()
    # water occupies bottom half of the crop
    mask = np.zeros((res, res), np.uint8)
    mask[res // 2:, :] = 1
    ratio = waterdepth_by_people(mask, pred, template, res)
    assert ratio is not None
    assert 0.35 <= ratio <= 0.65


def test_est_by_obj_detection_stopsign_synthetic(tmp_path):
    import cv2
    from vfloodnet_tpu.utils import save_seg_mask
    plate, top, bottom = make_stopsign_template()
    h, w = 400, 420
    img = np.full((h, w, 3), 255, np.uint8)
    seg = np.zeros((h, w), np.uint8)
    cv2.fillPoly(seg, [plate.astype(np.int32)], 1)

    # water covers the bottom 30% of the projected pole
    water = np.zeros((h, w), np.uint8)
    water_y = int(top[1] + 0.7 * (bottom[1] - top[1]))
    water[water_y:, :] = 1

    img_path = str(tmp_path / "frame.png")
    cv2.imwrite(img_path, img)
    mask_path = str(tmp_path / "frame_mask.png")
    save_seg_mask(water, mask_path)

    def detector(_img):
        return Instances(boxes=np.array([[100., 25., 200., 125.]]),
                         scores=np.array([0.99]),
                         classes=np.array([11]),
                         masks=seg[None])

    out = est_by_obj_detection([img_path], [mask_path], str(tmp_path),
                               "stopsign", detector=detector)
    rows = open(out).read().strip().split("\n")
    assert len(rows) == 1
    name, ratio, depth = rows[0].split("\t")
    ratio, depth = float(ratio), float(depth)
    assert 0.2 <= ratio <= 0.4
    np.testing.assert_allclose(depth, ratio * 215.9, rtol=1e-4)


def test_site_profiles():
    assert site_profile("houston_x").tracker_num == 2
    assert not site_profile("houston_x").enable_calib
    assert site_profile("boston_video").enable_tracker
    assert site_profile("somewhere").name == "default"
