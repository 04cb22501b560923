"""Long-video water level vs. a fixed reference object.

Capability parity with the reference est_by_reference
(estimation/reference_tracking.py:116-239): optional homography
rectification, stored-or-interactive reference bbox, optional CSRT tracking,
per-frame waterline extraction below the bbox, Gaussian smoothing, CSV +
hydrograph plot.

TPU-native redesign: the per-frame mask -> waterline scan is the device op
:func:`vfloodnet_tpu.ops.waterline_below` (the reference scans pixels in
Python, :197-204); masks can stay device-resident from the segmentation
stage. Calibration (4-point homography / ROI selection) is isolated behind
functions that prefer stored ``homo_mat.txt`` / ``ref_bbox.txt`` records and
only fall back to an interactive OpenCV GUI when a display is available.
"""

from __future__ import annotations

import os
import shutil
import warnings
from datetime import datetime
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import WATER_LABEL_ID, site_profile
from ..ops.waterline import waterline_below
from ..utils import COLOR_PALETTE, add_overlay, load_image, load_mask


def load_or_pick_homography(first_img_path: str, homo_mat_path: str
                            ) -> Optional[np.ndarray]:
    """Load a stored 3x3 homography; interactively pick 4 points if absent
    (reference get_video_homo, :44-81)."""
    if os.path.exists(homo_mat_path):
        return np.loadtxt(homo_mat_path).reshape(3, 3)
    try:
        return _interactive_homography(first_img_path, homo_mat_path)
    except Exception as e:
        raise RuntimeError(
            f"No homography at {homo_mat_path} and interactive calibration "
            f"unavailable ({e}). Provide homo_mat.txt.") from e


def _interactive_homography(img_path: str, out_path: str) -> np.ndarray:
    import cv2
    pts: List[Tuple[int, int]] = []
    win = "Select 4 pts (TopLeft, TopRight, BottomLeft, BottomRight)"
    img = cv2.imread(img_path)

    def on_mouse(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            pts.append((x, y))
            cv2.circle(param, (x, y), 5, (0, 0, 200), -1)
            cv2.imshow(win, param)

    canvas = img.copy()
    cv2.namedWindow(win)
    cv2.setMouseCallback(win, on_mouse, param=canvas)
    cv2.imshow(win, img)
    while len(pts) < 4:
        cv2.waitKey(30)
    cv2.destroyWindow(win)

    d_x = float(np.hypot(pts[1][0] - pts[0][0], pts[1][1] - pts[0][1]))
    d_y = float(np.hypot(pts[2][0] - pts[0][0], pts[2][1] - pts[0][1]))
    dst = [pts[0],
           (pts[0][0] + d_x, pts[0][1]),
           (pts[0][0], pts[0][1] + d_y),
           (pts[0][0] + d_x, pts[0][1] + d_y)]
    homo, _ = cv2.findHomography(np.float32(pts), np.float32(dst))
    np.savetxt(out_path, homo, "%.4f")
    return homo


def load_or_pick_bboxes(ref_img: np.ndarray, ref_bbox_path: str,
                        tracker_num: int) -> List[Tuple[int, int, int, int]]:
    """Load stored reference bboxes; interactive ROI selection if absent
    (reference get_video_ref, :84-113)."""
    if os.path.exists(ref_bbox_path):
        arr = np.loadtxt(ref_bbox_path).astype(int)
        if arr.ndim == 1:
            arr = arr[None]
        return [tuple(b) for b in arr[:tracker_num]]
    try:
        import cv2
        boxes = []
        win = "Select A Rect As Reference Obj"
        for t in range(tracker_num):
            while True:
                box = cv2.selectROI(win, ref_img, fromCenter=False)
                if box[2] > 0 and box[3] > 0:
                    break
            boxes.append(tuple(int(v) for v in box))
        cv2.destroyWindow(win)
        np.savetxt(ref_bbox_path, np.array(boxes), "%.4f")
        return boxes
    except Exception as e:
        raise RuntimeError(
            f"No reference bbox at {ref_bbox_path} and interactive selection "
            f"unavailable ({e}). Provide ref_bbox.txt.") from e


def _make_trackers(ref_img: np.ndarray, bboxes) -> Optional[list]:
    """CSRT when the cv2 build ships it; otherwise the first-party JAX
    MOSSE correlation tracker (ops/tracker.py) — the reference's tracking
    capability (estimation/reference_tracking.py:105-113) stays live even
    on cv2 builds without contrib trackers."""
    try:
        import cv2
        mk = getattr(cv2, "TrackerCSRT_create", None)
        if mk is None:
            mk = cv2.legacy.TrackerCSRT_create
        trackers = []
        for b in bboxes:
            t = mk()
            t.init(ref_img, tuple(int(v) for v in b))
            trackers.append(t)
        return trackers
    except Exception:
        pass
    try:
        from ..ops.tracker import MosseTracker
        trackers = []
        for b in bboxes:
            t = MosseTracker()
            t.init(ref_img, tuple(int(v) for v in b))
            trackers.append(t)
        warnings.warn("cv2 CSRT unavailable; using the first-party MOSSE "
                      "correlation tracker.")
        return trackers
    except Exception as e:
        warnings.warn(f"No tracker available ({e}); using static bboxes.")
        return None


def _gaussian_smooth_nearest(x: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    from scipy.ndimage import gaussian_filter1d
    return gaussian_filter1d(x, sigma=sigma, mode="nearest")


def est_by_reference(img_list: Sequence[str], water_mask_list: Sequence[str],
                     out_dir: str, record_dir: str, test_name: str,
                     viz: bool = True) -> str:
    """Returns the path of the waterlevel CSV."""
    import cv2
    import pandas as pd

    prof = site_profile(test_name)
    os.makedirs(out_dir, exist_ok=True)
    viz_dir = os.path.join(out_dir, "viz")
    if viz:
        os.makedirs(viz_dir, exist_ok=True)

    homo_mat = None
    if prof.enable_calib:
        rec = os.path.join(record_dir, test_name, "homo_mat.txt")
        local = os.path.join(out_dir, "homo_mat.txt")
        if os.path.exists(rec):
            shutil.copyfile(rec, local)
        homo_mat = load_or_pick_homography(img_list[0], local)

    rec_bbox = os.path.join(record_dir, test_name, "ref_bbox.txt")
    local_bbox = os.path.join(out_dir, "ref_bbox.txt")
    if os.path.exists(rec_bbox):
        shutil.copyfile(rec_bbox, local_bbox)

    ref_bboxes = None
    trackers = None
    waterlevels: List[List[float]] = []
    timestamps: List[datetime] = []

    prev = [0.0] * prof.tracker_num
    for i, (img_path, mask_path) in enumerate(zip(img_list, water_mask_list)):
        img = cv2.imread(img_path)
        mask = load_mask(mask_path)
        if homo_mat is not None:
            size = (img.shape[1], img.shape[0])
            img = cv2.warpPerspective(img, homo_mat, size)
            mask = cv2.warpPerspective(mask, homo_mat, size,
                                       flags=cv2.INTER_NEAREST)

        if ref_bboxes is None:
            ref_bboxes = load_or_pick_bboxes(img, local_bbox, prof.tracker_num)
            if prof.enable_tracker:
                trackers = _make_trackers(img, ref_bboxes)

        name = os.path.splitext(os.path.basename(img_path))[0]
        try:
            timestamps.append(datetime.strptime(name, prof.time_fmt))
        except ValueError:
            timestamps.append(datetime.fromtimestamp(i))

        if trackers is not None:
            new_boxes = []
            for t, tr in enumerate(trackers):
                ok, box = tr.update(img)
                if ok:
                    new_boxes.append(tuple(int(v) for v in box))
                else:
                    warnings.warn(f"Tracker {t} failed at frame {name}.")
                    new_boxes.append(ref_bboxes[t])
            ref_bboxes = new_boxes

        viz_img = add_overlay(img, mask, COLOR_PALETTE) if viz else None
        est = list(prev)
        mask_dev = jnp.asarray(mask)
        for t, (x, y, w, h) in enumerate(ref_bboxes):
            key_x, key_y = int(x + w / 2), int(y + h)
            hit_row = int(waterline_below(mask_dev, jnp.int32(key_x),
                                          jnp.int32(key_y),
                                          water_label=WATER_LABEL_ID))
            if hit_row < mask.shape[0]:
                level = hit_row - key_y
                est[t] = float("nan") if level == 1 else float(level)
                if viz_img is not None and level != 1:
                    cv2.line(viz_img, (key_x, key_y), (key_x, hit_row),
                             (0, 0, 200), 2)
            if viz_img is not None:
                cv2.rectangle(viz_img, (x, y), (x + w, y + h), (0, 200, 0), 2)
        waterlevels.append(est)
        prev = est
        if viz_img is not None:
            cv2.imwrite(os.path.join(viz_dir, f"{name}.png"), viz_img)

    wl = np.array(waterlevels, np.float64)
    cols = {}
    for t in range(prof.tracker_num):
        wl[:, t] = _gaussian_smooth_nearest(wl[:, t], sigma=2.0)
        cols[f"est_ref{t}_px"] = wl[:, t]
    df = pd.DataFrame(cols, index=timestamps)
    df["est_avg_px"] = np.nanmean(wl, axis=1)
    csv_path = os.path.join(out_dir, "waterlevel.csv")
    df.to_csv(csv_path)

    _plot_hydrograph(df, timestamps, prof, out_dir)
    return csv_path


def _plot_hydrograph(df, timestamps, prof, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.dates as mdates
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(20, 10))
    ax = fig.add_subplot(111)
    ax.plot(timestamps, df["est_avg_px"], "o", label="Average")
    if prof.tracker_num > 1:
        for t in range(prof.tracker_num):
            ax.plot(timestamps, df[f"est_ref{t}_px"], "o",
                    label=f"Estimate by ref {t}")
        ax.legend(loc="lower right", fontsize=24)
    unit, interval = prof.tick
    locator = (mdates.HourLocator(interval=interval) if unit == "hour"
               else mdates.MinuteLocator(interval=interval))
    ax.xaxis.set_major_locator(locator)
    ax.xaxis.set_major_formatter(mdates.DateFormatter("%m-%d %H:%M"))
    ax.set_ylabel("Estimated Water Level (pixel)", fontsize=24)
    plt.setp(ax.get_xticklabels(), rotation=45, ha="right", fontsize=24)
    plt.setp(ax.get_yticklabels(), fontsize=24)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "waterlevel_px.png"), dpi=300)
    plt.close(fig)
