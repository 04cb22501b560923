"""Reference tracking + hydrograph comparison on a synthetic long video."""

import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from vfloodnet_tpu.pipelines.hydrograph import compare_hydrographs
from vfloodnet_tpu.pipelines.reference_tracking import est_by_reference
from vfloodnet_tpu.utils import save_seg_mask


def _make_video(tmp_path, n=8, h=120, w=160):
    import cv2
    img_dir = tmp_path / "frames"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir(); mask_dir.mkdir()
    t0 = datetime(2021, 5, 1, 12, 0, 0)
    img_list, mask_list, levels = [], [], []
    for i in range(n):
        name = (t0 + timedelta(minutes=3 * i)).strftime("%Y-%m-%d-%H-%M-%S")
        img = np.full((h, w, 3), 180, np.uint8)
        # reference object: a dark post at x=80, y=20..40
        img[20:40, 76:84] = 40
        water_row = 90 - i * 3    # water rising 3px per frame
        mask = np.zeros((h, w), np.uint8)
        mask[water_row:, :] = 1
        cv2.imwrite(str(img_dir / f"{name}.png"), img)
        save_seg_mask(mask, str(mask_dir / f"{name}.png"))
        img_list.append(str(img_dir / f"{name}.png"))
        mask_list.append(str(mask_dir / f"{name}.png"))
        levels.append(water_row)
    return img_list, mask_list, levels, t0


def test_est_by_reference_headless(tmp_path):
    img_list, mask_list, levels, t0 = _make_video(tmp_path)
    out_dir = tmp_path / "out"
    record_dir = tmp_path / "records"
    site = record_dir / "LSU_test"
    site.mkdir(parents=True)
    # stored bbox: x, y, w, h around the post (headless path)
    np.savetxt(site / "ref_bbox.txt", np.array([[74.0, 18.0, 12.0, 24.0]]))

    csv = est_by_reference(img_list, mask_list, str(out_dir),
                           str(record_dir), "LSU_test")
    df = pd.read_csv(csv, index_col=0, parse_dates=True)
    assert len(df) == len(img_list)
    # water rises -> distance from bbox bottom to waterline shrinks
    est = df["est_avg_px"].to_numpy()
    assert est[0] > est[-1]
    # key point y = 18+24 = 42; first frame water at 90 -> ~48 px
    assert abs(est[0] - 48) < 4
    assert os.path.exists(out_dir / "waterlevel_px.png")
    assert os.path.exists(out_dir / "viz")


def test_compare_hydrographs(tmp_path):
    img_list, mask_list, levels, t0 = _make_video(tmp_path)
    out_dir = tmp_path / "out"
    record_dir = tmp_path / "records"
    site = record_dir / "LSU_test"
    site.mkdir(parents=True)
    np.savetxt(site / "ref_bbox.txt", np.array([[74.0, 18.0, 12.0, 24.0]]))
    csv = est_by_reference(img_list, mask_list, str(out_dir),
                           str(record_dir), "LSU_test", viz=False)

    # groundtruth gauge: water level in meters, rising 0.03 m per 3 min
    # px->meter: distances shrink as water rises; est_px = (water_row - 42).
    # meters = -0.01 * px + 0.9 roughly inverts that.
    times = [t0 + timedelta(minutes=3 * i) for i in range(len(levels))]
    gt_m = [(120 - wr) * 0.01 for wr in levels]
    gt = pd.DataFrame({"time": times, "level_m": gt_m})
    gt_path = tmp_path / "gt.csv"
    gt.to_csv(gt_path, index=False)
    px2m = tmp_path / "px_to_meter.txt"
    np.savetxt(px2m, np.array([-0.01, 0.78]))

    res = compare_hydrographs(str(csv), str(gt_path), str(px2m),
                              str(tmp_path / "cmp"))
    assert res["n"] == len(levels)
    # smoothing + affine should land within ~6 cm
    assert res["mean_abs_err_cm"] < 6.0
    assert os.path.exists(tmp_path / "cmp" / "hydrograph_cmp.png")
    assert os.path.exists(tmp_path / "cmp" / "cmp_report.txt")


# ---------------------------------------------------------------------------
# Site-specific gauge formats (reference cmp_hydrograph.py:65-86): fixture
# gt.csv per site under tests/fixtures/gauge.
# ---------------------------------------------------------------------------

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "gauge")


def _est_csv(tmp_path, times, cols):
    df = pd.DataFrame(cols, index=pd.to_datetime(times))
    path = tmp_path / "waterlevel.csv"
    df.to_csv(path)
    return str(path)


def _px2m(tmp_path, rows):
    path = tmp_path / "px_to_meter.txt"
    np.savetxt(path, np.asarray(rows))
    return str(path)


def test_boston_harbor_gauge_format(tmp_path):
    """Two-column datetime, value col 4, and the 20190119_20190123 gauge
    clock correction of -60 min."""
    times = ["2019-01-19 11:00", "2019-01-19 12:00"]
    est = _est_csv(tmp_path, times, {"est_ref0_px": [1.8, 1.6]})
    px2m = _px2m(tmp_path, [[1.0, 0.0]])
    gt = os.path.join(FIXTURES, "boston_harbor_gt.csv")

    # with the shift trigger: gt times move -60 min, so 11:00 est reads the
    # original 12:00 gauge value (1.8) -> exact match
    res = compare_hydrographs(est, gt, px2m,
                              test_name="boston_harbor_20190119_20190123")
    assert res["site_profile"] == "boston_harbor"
    assert res["mean_abs_err_cm"] < 1e-6

    # without the trigger substring the shift must NOT apply:
    # gauge at 11:00 = 1.4, 12:00 = 1.8 -> errors 0.4 and 0.2 m
    res = compare_hydrographs(est, gt, px2m,
                              test_name="boston_harbor_other")
    assert abs(res["mean_abs_err_cm"] - 30.0) < 1e-6


def test_houston_gauge_format(tmp_path):
    """'%m/%d/%Y %H:%M' timestamps, value col 2, multi-tracker averaging."""
    times = ["2019-01-19 10:30", "2019-01-19 12:00"]
    # two trackers at 2x meters each; px2m rows halve them -> exact values
    est = _est_csv(tmp_path, times, {"est_ref0_px": [19.6, 21.2],
                                     "est_ref1_px": [19.6, 21.2],
                                     "est_avg_px": [19.6, 21.2]})
    px2m = _px2m(tmp_path, [[0.5, 0.0], [0.5, 0.0]])
    gt = os.path.join(FIXTURES, "houston_gt.csv")
    res = compare_hydrographs(est, gt, px2m, test_name="houston_buffalo")
    assert res["site_profile"] == "houston"
    # gauge interp at 10:30 = 9.8; 12:00 = 10.6 -> est 9.8 / 10.6 exact
    assert res["mean_abs_err_cm"] < 1e-6
    # err rate normalised by gauge peak (10.6 m)
    assert res["mean_err_rate"] < 1e-6


def test_lsu_gauge_format(tmp_path):
    """'%Y-%m-%d-%H-%M-%S' timestamps with a corrupt row (coerce-dropped),
    value col 1."""
    times = ["2021-03-05 10:00:30", "2021-03-05 10:02:30"]
    est = _est_csv(tmp_path, times, {"est_ref0_px": [0.225, 0.29]})
    px2m = _px2m(tmp_path, [[1.0, 0.0]])
    gt = os.path.join(FIXTURES, "LSU_gt.csv")
    res = compare_hydrographs(est, gt, px2m, test_name="LSU_demo")
    assert res["site_profile"] == "LSU"
    # the bad row must be dropped; interp: 10:00:30 -> 0.225, 10:02:30 -> 0.29
    assert res["mean_abs_err_cm"] < 1e-6
