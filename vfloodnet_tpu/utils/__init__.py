from .palette import (COLOR_PALETTE, save_seg_mask, load_image, load_mask,
                      add_overlay, save_overlay)
from .meters import AvgMeter, FrameSecondMeter, gct, save_scripts
from .profiling import force, fetch_floor

__all__ = [
    "COLOR_PALETTE", "save_seg_mask", "load_image", "load_mask",
    "add_overlay", "save_overlay",
    "AvgMeter", "FrameSecondMeter", "gct", "save_scripts",
    "force", "fetch_floor",
]
