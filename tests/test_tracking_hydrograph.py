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
