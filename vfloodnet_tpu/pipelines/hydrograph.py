"""Hydrograph comparison against gauge groundtruth.

Capability parity with scripts/cmp_hydrograph.py (reference C17): convert
pixel water levels to meters via a per-site affine ``px_to_meter.txt``,
linearly resample the gauge series to the estimate timestamps, and report
mean/std absolute error in cm and %, plus a comparison plot.
"""

from __future__ import annotations

import os

from typing import Optional, Tuple

import numpy as np
import pandas as pd


def load_px_to_meter(path: str) -> Tuple[float, float]:
    """Affine px->meter calibration: two numbers (scale, offset) such that
    meters = scale * px + offset."""
    vals = np.loadtxt(path).reshape(-1)
    if vals.size == 1:
        return float(vals[0]), 0.0
    return float(vals[0]), float(vals[1])


def resample_gt(gt_times: np.ndarray, gt_values: np.ndarray,
                est_times: np.ndarray) -> np.ndarray:
    """Linear interpolation of the gauge series onto estimate timestamps
    (reference get_gt_sample, cmp_hydrograph.py:27-38)."""
    gt_s = np.array([t.timestamp() for t in gt_times])
    est_s = np.array([t.timestamp() for t in est_times])
    return np.interp(est_s, gt_s, gt_values)


def compare_hydrographs(est_csv: str, gt_csv: str, px_to_meter_path: str,
                        out_dir: Optional[str] = None,
                        gt_time_col: str = 0, gt_value_col: int = 1) -> dict:
    """Returns {'mean_abs_err_cm', 'std_abs_err_cm', 'mean_err_rate'} and
    writes a comparison plot when out_dir is given."""
    est = pd.read_csv(est_csv, index_col=0, parse_dates=True)
    scale, offset = load_px_to_meter(px_to_meter_path)
    est_m = est["est_avg_px"].to_numpy() * scale + offset

    gt = pd.read_csv(gt_csv)
    gt_times = pd.to_datetime(gt.iloc[:, 0]).to_list()
    gt_vals = gt.iloc[:, gt_value_col].to_numpy(np.float64)
    est_times = [t.to_pydatetime() if hasattr(t, "to_pydatetime") else t
                 for t in est.index]
    gt_resampled = resample_gt(np.array(gt_times), gt_vals,
                               np.array(est_times))

    ok = np.isfinite(est_m)
    abs_err_cm = np.abs(est_m[ok] - gt_resampled[ok]) * 100.0
    span = max(gt_resampled.max() - gt_resampled.min(), 1e-9) * 100.0
    result = {
        "mean_abs_err_cm": float(abs_err_cm.mean()),
        "std_abs_err_cm": float(abs_err_cm.std()),
        "mean_err_rate": float((abs_err_cm / span).mean()),
        "n": int(ok.sum()),
    }

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(16, 8))
        ax.plot(est_times, est_m, "o", label="estimate (m)")
        ax.plot(est_times, gt_resampled, "-", label="gauge (m)")
        ax.set_ylabel("water level (m)")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "hydrograph_cmp.png"), dpi=200)
        plt.close(fig)
        with open(os.path.join(out_dir, "cmp_report.txt"), "w") as f:
            f.write(f"mean abs err: {result['mean_abs_err_cm']:.2f} cm\n"
                    f"std abs err:  {result['std_abs_err_cm']:.2f} cm\n"
                    f"err rate:     {result['mean_err_rate'] * 100:.2f} %\n"
                    f"samples:      {result['n']}\n")
    return result
