"""Visualizer smoke tests."""

import os

import numpy as np

from vfloodnet_tpu.utils.visualize import Visualizer


def test_plot_seg_and_depth(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    mask = np.zeros((60, 80), np.uint8)
    mask[30:, :] = 1
    depth = np.where(mask > 0, np.linspace(0, 50, 60)[:, None]
                     * np.ones((60, 80)), np.nan)

    viz = Visualizer()
    seg_path = str(tmp_path / "seg.png")
    depth_path = str(tmp_path / "depth.png")
    viz.plot_seg(img, mask, seg_path)
    viz.plot_depth(img, depth, depth_path, mask=mask)
    assert os.path.getsize(seg_path) > 0
    assert os.path.getsize(depth_path) > 0

    # all-NaN depth must not crash
    viz.plot_depth(img, np.full((60, 80), np.nan),
                   str(tmp_path / "empty.png"))
