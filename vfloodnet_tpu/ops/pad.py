"""Static padding helpers.

TPU-native replacement for the reference's ``pad_divide_by``
(myutils/data.py:132-149): pads NHWC tensors so spatial dims are multiples of
``d``. Pad amounts are computed from *static* shapes at trace time so the
jitted graph stays static-shape.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def pad_amounts(h: int, w: int, d: int) -> Tuple[int, int, int, int]:
    """Return (top, bottom, left, right) pad to make (h, w) multiples of d.

    Mirrors the centered-padding split of the reference (floor on the
    leading side).
    """
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    top = (new_h - h) // 2
    bottom = (new_h - h) - top
    left = (new_w - w) // 2
    right = (new_w - w) - left
    return top, bottom, left, right


def pad_divide_by(x: jnp.ndarray, d: int, spatial_axes: Tuple[int, int] = (-3, -2)):
    """Pad spatial axes of ``x`` (default NHWC: axes -3, -2) to multiples of d.

    Returns (padded, (top, bottom, left, right)).
    """
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    h, w = x.shape[h_ax], x.shape[w_ax]
    top, bottom, left, right = pad_amounts(h, w, d)
    pads = [(0, 0)] * x.ndim
    pads[h_ax] = (top, bottom)
    pads[w_ax] = (left, right)
    return jnp.pad(x, pads), (top, bottom, left, right)


def unpad(x: jnp.ndarray, pad: Sequence[int], spatial_axes: Tuple[int, int] = (-3, -2)):
    """Inverse of :func:`pad_divide_by`."""
    top, bottom, left, right = pad
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    idx = [slice(None)] * x.ndim
    idx[h_ax] = slice(top, x.shape[h_ax] - bottom if bottom else None)
    idx[w_ax] = slice(left, x.shape[w_ax] - right if right else None)
    return x[tuple(idx)]
