"""Device-side resize ops.

Replaces the reference's torchvision ``TF.resize`` calls (test_video_seg.py:88,
107,114; test_image_seg.py:57-60) with ``jax.image.resize``-based kernels that
run inside jit on TPU. ``bicubic``/``bilinear`` use half-pixel-centred
sampling (equivalent to PyTorch ``align_corners=False`` + antialias), which is
what PIL produces; golden tests bound the delta.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_METHODS = {
    "nearest": "nearest",
    "bilinear": "linear",
    "bicubic": "cubic",
}


def short_side_size(h: int, w: int, target: int) -> Tuple[int, int]:
    """Compute (new_h, new_w) resizing the short side to ``target``.

    Mirrors torchvision's single-int Resize semantics used at
    test_video_seg.py:88 (downsample_size=480): the long side is
    ``int(target * long / short)`` — truncated, not rounded
    (torchvision ``_compute_resized_output_size``).
    """
    if h <= w:
        new_h = target
        new_w = max(1, int(target * w / h))
    else:
        new_w = target
        new_h = max(1, int(target * h / w))
    return new_h, new_w


def resize(x: jnp.ndarray, out_hw: Tuple[int, int], method: str = "bilinear",
           spatial_axes: Tuple[int, int] = (-3, -2),
           antialias: bool = False) -> jnp.ndarray:
    """Resize spatial axes of ``x`` to ``out_hw``.

    Defaults to NHWC layout (axes -3, -2). ``method`` in
    {nearest, bilinear, bicubic}.

    ``antialias`` defaults to False to match the reference's torchvision
    *tensor* resizes (TF.resize without antialias, test_video_seg.py:88,107,
    114; test_image_seg.py:108) — and it compiles to a much smaller XLA
    graph. Set True only where PIL semantics are required (PIL always
    antialiases, e.g. the image model's input resize via tf.Resize on a PIL
    image, test_image_seg.py:57).
    """
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    shape = list(x.shape)
    shape[h_ax], shape[w_ax] = out_hw
    jmethod = _METHODS[method]
    if method == "nearest":
        return jax.image.resize(x, shape, method="nearest")
    # bf16 inputs interpolate in bf16 (the resize lowers to matmuls whose
    # MXU accumulation is f32, so only the stored taps lose precision —
    # ~0.4% on [0,1] imagery, within the bf16 production tolerance, for
    # half the HBM traffic). Everything else computes in f32.
    compute = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    out = jax.image.resize(x.astype(compute), shape, method=jmethod,
                           antialias=antialias)
    return out.astype(x.dtype)


def resize_short_side(x: jnp.ndarray, target: int, method: str = "bilinear",
                      spatial_axes: Tuple[int, int] = (-3, -2),
                      antialias: bool = False) -> jnp.ndarray:
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    out_hw = short_side_size(x.shape[h_ax], x.shape[w_ax], target)
    return resize(x, out_hw, method=method, spatial_axes=spatial_axes,
                  antialias=antialias)
