"""Depth/segmentation visualisation.

Capability parity with the reference Visualizer (myutils/plot_depth.py:17-76):
``plot_seg`` overlays a mask; ``plot_depth`` renders contour-filled depth
maps over the image.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .palette import COLOR_PALETTE, add_overlay


class Visualizer:
    def __init__(self, out_dpi: int = 120):
        self.out_dpi = out_dpi

    def plot_seg(self, img_bgr: np.ndarray, mask: np.ndarray,
                 out_path: str, alpha: float = 0.4) -> None:
        from PIL import Image
        overlay = add_overlay(img_bgr, mask, COLOR_PALETTE, alpha)
        Image.fromarray(overlay[..., ::-1]).save(out_path)

    def plot_depth(self, img_bgr: np.ndarray, depth: np.ndarray,
                   out_path: str, levels: int = 10,
                   mask: Optional[np.ndarray] = None,
                   alpha: float = 0.55) -> None:
        """Contour-filled depth map over the image (reference
        plot_depth.py:39-76). depth: [H, W] float (e.g. cm); NaN/negative =
        no estimate. mask optionally restricts the fill region."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        h, w = depth.shape
        fig, ax = plt.subplots(figsize=(w / self.out_dpi, h / self.out_dpi),
                               dpi=self.out_dpi)
        ax.imshow(img_bgr[..., ::-1])
        d = np.array(depth, np.float64)
        if mask is not None:
            d = np.where(mask > 0, d, np.nan)
        d = np.where(d >= 0, d, np.nan)
        if np.isfinite(d).any():
            cs = ax.contourf(d, levels=levels, cmap="turbo", alpha=alpha)
            cbar = fig.colorbar(cs, ax=ax, fraction=0.035)
            cbar.set_label("water depth (cm)")
        ax.set_axis_off()
        fig.tight_layout(pad=0)
        fig.savefig(out_path, dpi=self.out_dpi, bbox_inches="tight")
        plt.close(fig)
