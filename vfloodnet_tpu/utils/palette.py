"""Host-boundary image IO: palette PNG masks and overlays.

The stage contract of the reference pipeline is indexed-PNG masks with a fixed
palette where water = label 1 (myutils/data.py:14,49-53; masks consumed back
at est_waterlevel.py:26-28). These helpers keep that contract bit-compatible.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image

# Same palette as the reference (myutils/data.py:14):
# background black, water navy, then green/red, grey filler.
COLOR_PALETTE = [0, 0, 0, 0, 0, 128, 0, 128, 0, 128, 0, 0] + [100, 100, 100] * 252


def save_seg_mask(pred: np.ndarray, seg_path: str,
                  palette: Sequence[int] = COLOR_PALETTE) -> None:
    """Write an indexed-PNG mask (uint8 labels) with the standard palette.

    Uses the native libpng writer (vfloodnet_tpu.native) when available —
    ~10x faster than PIL for 1080p masks — with a PIL fallback."""
    pred = np.asarray(pred, dtype=np.uint8)
    from .. import native
    if native.write_palette_png(seg_path, pred, palette):
        return
    img = Image.fromarray(pred, mode="P")
    img.putpalette(list(palette))
    img.save(seg_path)


def load_image(path: str, mode: str = "RGB") -> Image.Image:
    img = Image.open(path)
    img.load()
    return img.convert(mode)


def load_mask(path: str) -> np.ndarray:
    """Load an indexed-PNG mask as uint8 labels (native fast path when the
    file is already an indexed/gray PNG; PIL otherwise)."""
    if path.endswith(".png"):
        from .. import native
        out = native.read_palette_png(path)
        if out is not None:
            return out
    return np.asarray(load_image(path, "P"), dtype=np.uint8)


def _dilate(mask: np.ndarray) -> np.ndarray:
    out = mask.copy()
    out[1:, :] |= mask[:-1, :]
    out[:-1, :] |= mask[1:, :]
    out[:, 1:] |= mask[:, :-1]
    out[:, :-1] |= mask[:, 1:]
    return out


def add_overlay(img_bgr: np.ndarray, mask: np.ndarray,
                colors: Sequence[int] = COLOR_PALETTE,
                alpha: float = 0.4, cscale: float = 1.0) -> np.ndarray:
    """Blend mask colors onto a BGR image and draw component contours.

    Same visual contract as the reference overlay writer
    (myutils/data.py:56-75).
    """
    out = img_bgr.copy()
    color_table = np.atleast_2d(np.reshape(np.asarray(colors, dtype=np.float64), (-1, 3))) * cscale
    for label in np.unique(mask):
        if label == 0:
            continue
        binary = mask == label
        # blend only the masked pixels (the reference's full-image
        # ``img*alpha + ones*color`` canvas costs 3 full-res f64 passes per
        # label for pixels that are then discarded — profiled 0.88 s/image
        # at 1.3 MP; identical output, same convex blend + uint8 cast)
        col = color_table[label][::-1] * (1.0 - alpha)
        out[binary] = (img_bgr[binary] * alpha + col).astype(np.uint8)
        contour = _dilate(binary) ^ binary
        out[contour, :] = 0
    return out


def save_overlay(img_rgb: np.ndarray, mask: np.ndarray, overlay_path: str,
                 colors: Sequence[int] = COLOR_PALETTE,
                 alpha: float = 0.4, cscale: float = 1.0) -> None:
    """img_rgb: HWC RGB, either float01 or uint8."""
    img_rgb = np.asarray(img_rgb)
    if img_rgb.dtype != np.uint8:
        img_rgb = (img_rgb * 255).astype(np.uint8)
    img = img_rgb[..., ::-1]  # -> BGR
    overlay = add_overlay(np.ascontiguousarray(img), np.asarray(mask), colors,
                          alpha, cscale)
    try:
        import cv2
        if cv2.imwrite(overlay_path, overlay):   # already BGR; ~2x PIL
            return
    except ImportError:
        pass
    Image.fromarray(overlay[..., ::-1]).save(overlay_path)
