"""Still-image water segmentation pipeline (LinkNet + EfficientNet-B4).

Capability parity with the reference test_image_seg.py:44-151: resize to
416x416, ImageNet-normalise, forward, sigmoid-threshold, resize back,
largest-connected-component cleanup, palette PNG + overlay — all device-side
except the PNG encode.
"""

from __future__ import annotations

import os
import warnings
from glob import glob
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..utils import gct, load_image, save_overlay, save_seg_mask

MODEL_DIMS = (416, 416)  # reference test_image_seg.py:79


def _build_pipeline(model, variables, postprocess: bool = True):
    """One jitted function per input resolution: resize-in, forward,
    resize-back, threshold, largest-CC — all device-side."""
    @jax.jit
    def run(img01: jnp.ndarray):
        x = ops.resize(img01[None], MODEL_DIMS, "bilinear", antialias=True)
        prob = model.apply(variables, x)[0]             # [416,416,1] sigmoid
        up = ops.resize(prob, img01.shape[:2], "bilinear",
                        spatial_axes=(0, 1))[..., 0]
        label = (up > 0.5).astype(jnp.uint8)
        if postprocess:
            # component filter at model resolution, keep-mask upsampled —
            # equivalent to the reference's full-res largest-CC cleanup
            # (myutils/data.py:17-37) at a fraction of the cost.
            keep = ops.largest_connected_component(
                (prob[..., 0] > 0.5).astype(jnp.uint8))
            keep_full = ops.resize(keep, img01.shape[:2], "nearest",
                                   spatial_axes=(-2, -1))
            label = label * keep_full
        return label
    return run


def run_image_segmentation(test_path: str, test_name: str,
                           out_path: str = "./output/segs",
                           model_path: Optional[str] = None,
                           model=None, variables=None) -> list:
    """Segment one image file or a directory of images.

    Returns list of (mask_path, overlay_path).
    """
    if model is None:
        from ..models.linknet import load_linknet
        model, variables = load_linknet(model_path)

    mask_out = os.path.join(out_path, test_name, "mask")
    overlay_out = os.path.join(out_path, test_name, "overlay")
    os.makedirs(mask_out, exist_ok=True)
    os.makedirs(overlay_out, exist_ok=True)

    if os.path.isfile(test_path):
        paths = [test_path]
    else:
        paths = sorted(glob(os.path.join(test_path, "*.jpg"))
                       + glob(os.path.join(test_path, "*.png")))

    run = _build_pipeline(model, variables)

    results = []
    for path in paths:
        img = np.asarray(load_image(path), np.float32) / 255.0
        label = run(jax.device_put(img))
        pred = np.asarray(jax.device_get(label))

        base = os.path.splitext(os.path.basename(path))[0]
        mask_path = os.path.join(mask_out, base + ".png")
        overlay_path = os.path.join(overlay_out, base + ".png")
        save_seg_mask(pred, mask_path)
        save_overlay(img, pred, overlay_path)
        results.append((mask_path, overlay_path))
    print(gct(), f"Segmented {len(paths)} image(s) -> {mask_out}")
    return results
