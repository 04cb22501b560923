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


def test_add_overlay_matches_reference():
    """The masked-pixel blend rewrite (utils/palette.py, round 4) must
    reproduce the reference's full-canvas f64 blend (myutils/data.py:56-75)
    to uint8-rounding tolerance on every pixel."""
    import sys

    import numpy as np
    import pytest

    pytest.importorskip("torch")
    from tests.torch_oracle import REFERENCE, _install_stubs
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import myutils

    from vfloodnet_tpu.utils.palette import COLOR_PALETTE, add_overlay

    rng = np.random.RandomState(0)
    img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    mask = np.zeros((120, 160), np.uint8)
    mask[40:90, 30:120] = 1
    mask[10:20, 5:25] = 2

    ref = myutils.add_overlay(img.copy(), mask, myutils.color_palette)
    mine = add_overlay(img.copy(), mask, COLOR_PALETTE)
    diff = np.abs(ref.astype(int) - mine.astype(int))
    assert diff.max() <= 1, f"overlay drifted: max diff {diff.max()}"
