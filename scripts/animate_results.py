#!/usr/bin/env python
"""Side-by-side result animation: input | overlay | growing hydrograph.

Capability parity with the reference scripts/animate_results.py:70-158:
renders an mp4 where each frame shows the input image, the segmentation
overlay/viz, and the water-level time series up to that frame.
"""

import argparse
import os
import sys
from glob import glob

import cv2
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.core.config import site_profile  # noqa: E402


def render_series_panel(times, values, upto, size):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(size[0] / 100, size[1] / 100), dpi=100)
    ax.plot(times[:upto + 1], values[:upto + 1], "-o", markersize=3)
    ax.set_xlim(times[0], times[-1])
    vmin, vmax = np.nanmin(values), np.nanmax(values)
    pad = max((vmax - vmin) * 0.1, 1.0)
    ax.set_ylim(vmin - pad, vmax + pad)
    ax.set_ylabel("water level (px)")
    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return cv2.cvtColor(buf, cv2.COLOR_RGB2BGR)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-dir", type=str, required=True)
    p.add_argument("--viz-dir", type=str, required=True,
                   help="Per-frame viz/overlay dir (waterlevel output)")
    p.add_argument("--csv", type=str, required=True,
                   help="waterlevel.csv from est_waterlevel --opt ref")
    p.add_argument("--out-path", type=str, required=True)
    p.add_argument("--fps", type=float, default=None)
    args = p.parse_args()

    imgs = sorted(glob(os.path.join(args.img_dir, "*.jpg"))
                  + glob(os.path.join(args.img_dir, "*.png")))
    df = pd.read_csv(args.csv, index_col=0, parse_dates=True)
    times = df.index.to_list()
    values = df["est_avg_px"].to_numpy()

    name = os.path.basename(os.path.normpath(args.img_dir))
    fps = args.fps or site_profile(name).fps

    first = cv2.imread(imgs[0])
    h, w = first.shape[:2]
    panel_w = w
    out_size = (w * 2 + panel_w, h)
    writer = cv2.VideoWriter(args.out_path,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, out_size)
    n = min(len(imgs), len(values))
    for i in range(n):
        img = cv2.imread(imgs[i])
        base = os.path.splitext(os.path.basename(imgs[i]))[0]
        viz_path = os.path.join(args.viz_dir, base + ".png")
        viz = cv2.imread(viz_path) if os.path.exists(viz_path) else img
        if viz.shape[:2] != (h, w):
            viz = cv2.resize(viz, (w, h))
        panel = render_series_panel(times, values, i, (panel_w, h))
        if panel.shape[:2] != (h, panel_w):
            panel = cv2.resize(panel, (panel_w, h))
        writer.write(np.concatenate([img, viz, panel], axis=1))
    writer.release()
    print(f"Wrote {n} frames -> {args.out_path}")


if __name__ == "__main__":
    main()
