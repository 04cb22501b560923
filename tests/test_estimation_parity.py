"""Estimation-stage ORACLE parity (VERDICT r4 'do this' #4).

The depth-quantification geometry — stopsign homography + pole march
(reference estimation/object_detection.py:57-188), people crop + boundary
medians (:191-257), reference-tracking column scan + sigma=2 smooth + CSV
(reference estimation/reference_tracking.py:197-239) — executed from the
REFERENCE code as a numerical oracle (imported with ~10-line detectron2
stubs, never copied) and compared against this framework's implementations
on identical inputs. Fails if any depth number drifts.
"""

import importlib
import os
import sys
import types
from datetime import datetime, timedelta

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_est():
    """Import the reference estimation modules with detectron2 stubbed
    (the geometry under test is pure numpy/cv2; detectron2 only appears in
    the model-loading paths we do not call)."""
    os.environ.setdefault("MPLBACKEND", "Agg")
    import matplotlib
    matplotlib.use("Agg", force=True)
    if not hasattr(np, "int"):   # removed in numpy>=1.24; used at
        np.int = int             # reference_tracking.py:88
    if not hasattr(np, "NaN"):   # removed in numpy 2.0; used at
        np.NaN = np.nan          # reference_tracking.py:201
    # torchvision/torch_scatter stubs (myutils imports torchvision.TF)
    from tests.torch_oracle import _install_stubs
    _install_stubs()
    if "detectron2" not in sys.modules:
        d2 = types.ModuleType("detectron2")
        cfg = types.ModuleType("detectron2.config")
        cfg.get_cfg = lambda: None
        eng = types.ModuleType("detectron2.engine")
        engd = types.ModuleType("detectron2.engine.defaults")
        engd.DefaultPredictor = object
        proj = types.ModuleType("detectron2.projects")
        pr = types.ModuleType("detectron2.projects.point_rend")
        pr.add_pointrend_config = lambda c: None
        st = types.ModuleType("detectron2.structures")
        st.Instances = type("Instances", (), {})
        for name, mod in {"detectron2": d2, "detectron2.config": cfg,
                          "detectron2.engine": eng,
                          "detectron2.engine.defaults": engd,
                          "detectron2.projects": proj,
                          "detectron2.projects.point_rend": pr,
                          "detectron2.structures": st}.items():
            sys.modules[name] = mod
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    od = importlib.import_module("estimation.object_detection")
    rt = importlib.import_module("estimation.reference_tracking")
    return od, rt


def _octagon_scene(h=480, w=640):
    """A stop-sign instance mask: the canonical octagon template under a
    known mild perspective, filled; water over the bottom rows."""
    import cv2

    from vfloodnet_tpu.pipelines.object_detection import \
        make_stopsign_template

    plate, _, _ = make_stopsign_template()
    H = np.array([[2.0, 0.05, 120.0],
                  [0.02, 2.1, 40.0],
                  [1e-4, 5e-5, 1.0]], np.float32)
    pts = cv2.perspectiveTransform(
        plate.reshape(-1, 1, 2).astype(np.float32), H).reshape(-1, 2)
    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
    water = np.zeros((h, w), np.uint8)
    water[380:, :] = 1
    img = np.full((h, w, 3), 127, np.uint8)
    return mask, water, img


def test_stopsign_depth_parity(ref_est, tmp_path):
    """Octagon fit -> homography -> pole march -> submerged ratio x 215.9cm
    vs the oracle's waterdepth_by_stopsign on the same instance mask."""
    od, _ = ref_est
    import torch

    from vfloodnet_tpu.pipelines.object_detection import (
        Instances, waterdepth_by_stopsign)

    mask, water, img = _octagon_scene()

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    inst_ref = types.SimpleNamespace(
        pred_classes=torch.tensor([11]),
        pred_masks=torch.tensor(mask[None].astype(bool)))
    ratio_ref, depth_ref = od.waterdepth_by_stopsign(
        img.copy(), inst_ref, water, str(ref_dir), "img0")

    inst = Instances(boxes=np.zeros((1, 4), np.float32),
                     scores=np.ones(1, np.float32),
                     classes=np.array([11]), masks=mask[None])
    ratio_j, depth_j = waterdepth_by_stopsign(
        img.copy(), inst, water, str(tmp_path / "jx"), "img0")

    # both must find the sign and a submerged pole
    assert ratio_ref > 0.05 and ratio_j > 0.05
    # contour extraction differs by design (Canny edge ring vs direct mask
    # contour, both cv2) so vertices may shift ~1px; the projected ratio
    # must agree to better than 1% of the pole
    assert abs(ratio_j - ratio_ref) < 0.01
    assert abs(depth_j - depth_ref) < 0.01 * 215.9


def test_people_boundary_and_ratio_parity(ref_est):
    """predict_boundary medians + submerge-ratio formula vs the oracle
    (reference predict_boundary :246-257 and the inline est loop
    :327-375 driven with the oracle function)."""
    od, _ = ref_est
    from vfloodnet_tpu.pipelines.object_detection import (
        _load_template_3d, waterdepth_by_people)

    rng = np.random.RandomState(3)
    res = 224
    template = _load_template_3d(None)
    for case in range(5):
        pred = template + rng.uniform(-0.08, 0.08, template.shape)
        crop_mask = np.zeros((res, res), np.uint8)
        crop_mask[120 + 10 * case:, :] = 1

        # reference inline computation (:350-373), oracle predict_boundary
        t = np.clip(((template + 1) * res / 2).astype(int), 0, res - 1)
        p = np.clip(((pred + 1) * res / 2).astype(int), 0, res - 1)
        t_top = t[:, 1].min()
        t_height = t[:, 1].max() - t_top
        water_label = crop_mask[p[:, 1], p[:, 0]]
        under = water_label.nonzero()
        above = (water_label == 0).nonzero()
        wb, _sel = od.predict_boundary(t[under][:, 1], t[above][:, 1], res)
        assert not np.isnan(wb)
        ratio_ref = 1 - (wb - t_top) / t_height

        ratio_j = waterdepth_by_people(crop_mask, pred, template)
        assert ratio_j is not None
        assert abs(ratio_j - ratio_ref) < 1e-9


def test_person_crop_parity(ref_est, tmp_path):
    """crop_person vs the oracle's crop+resize (waterdepth_by_people
    :191-243): the 224x224 person/mask crops must be pixel-exact, including
    the border clamping."""
    od, _ = ref_est
    import cv2
    import torch
    from PIL import Image

    from vfloodnet_tpu.pipelines.object_detection import crop_person

    rng = np.random.RandomState(0)
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    water = (rng.rand(300, 400) > 0.5).astype(np.uint8)
    boxes = [[50.0, 40.0, 140.0, 260.0],    # tall box -> clamps top/bottom
             [330.0, 100.0, 398.0, 200.0],  # clamps right edge
             [2.0, 5.0, 60.0, 120.0]]       # clamps left/top
    for bi, box in enumerate(boxes):
        inst = types.SimpleNamespace(pred_boxes=torch.tensor([box]),
                                     scores=torch.tensor([0.95]))
        out = tmp_path / f"ref{bi}"
        out.mkdir()
        od.waterdepth_by_people(inst, img, water, str(out), "img")
        ref_crop = cv2.imread(str(out / "input" / "img.png"))
        ref_mask = np.asarray(Image.open(out / "mask" / "img.png"))

        crop, mask_crop = crop_person(img, water, box)
        assert np.array_equal(crop, ref_crop)
        assert np.array_equal(mask_crop, ref_mask)


def test_reference_tracking_csv_parity(ref_est, tmp_path):
    """Full est_by_reference oracle run vs this framework's pipeline on
    identical frames/masks/records: per-frame column-scan levels, NaN
    forward-carry, sigma=2 Gaussian smoothing, and the waterlevel.csv
    contract must match (reference_tracking.py:163-218)."""
    _, rt = ref_est
    import cv2
    import pandas as pd

    from vfloodnet_tpu.pipelines.reference_tracking import est_by_reference
    from vfloodnet_tpu.utils import save_seg_mask

    h, w = 80, 100
    frames_dir = tmp_path / "frames"
    masks_dir = tmp_path / "masks"
    frames_dir.mkdir()
    masks_dir.mkdir()
    t0 = datetime(2021, 5, 1, 12, 0, 0)
    # bbox (40,10,20,20) -> key point (50, 30). level = first water row - 30.
    # None = no water (forward-carry); 31 -> level 1 -> NaN (reference :201)
    levels = [50, 48, 52, None, 46, 50, 44, 55,
              49, 47, 53, 51, 45, 48, 31, 50]
    rng = np.random.RandomState(1)
    img_list, mask_list = [], []
    for i, lv in enumerate(levels):
        name = (t0 + timedelta(minutes=3 * i)).strftime("%Y-%m-%d-%H-%M-%S")
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(frames_dir / f"{name}.png"), img)
        m = np.zeros((h, w), np.uint8)
        if lv is not None:
            m[lv:, :] = 1
        save_seg_mask(m, str(masks_dir / f"{name}.png"))
        img_list.append(str(frames_dir / f"{name}.png"))
        mask_list.append(str(masks_dir / f"{name}.png"))

    record = tmp_path / "records" / "LSU_par"
    record.mkdir(parents=True)
    np.savetxt(record / "ref_bbox.txt", np.array([[40.0, 10.0, 20.0, 20.0]]))

    out_ref = tmp_path / "out_ref"
    out_ref.mkdir()
    rt.est_by_reference(img_list, mask_list, str(out_ref),
                        str(tmp_path / "records"), "LSU_par")

    out_j = tmp_path / "out_j"
    out_j.mkdir()
    csv_j = est_by_reference(img_list, mask_list, str(out_j),
                             str(tmp_path / "records"), "LSU_par")

    df_r = pd.read_csv(out_ref / "waterlevel.csv", index_col=0)
    df_j = pd.read_csv(csv_j, index_col=0)
    assert list(df_r.index) == list(df_j.index)
    for col in ("est_ref0_px", "est_avg_px"):
        r, j = df_r[col].to_numpy(), df_j[col].to_numpy()
        assert np.array_equal(np.isnan(r), np.isnan(j)), col
        ok = ~np.isnan(r)
        # the raw scan levels are integers; smoothing is the same scipy
        # gaussian_filter1d on both sides -> bitwise-equal floats expected
        np.testing.assert_allclose(j[ok], r[ok], rtol=0, atol=1e-9,
                                   err_msg=col)
    # the NaN at frame 14 must poison exactly the same smoothing window
    assert np.isnan(df_j["est_ref0_px"].to_numpy()).sum() > 0
