"""Device-side resize ops.

Replaces the reference's torchvision ``TF.resize`` calls (test_video_seg.py:88,
107,114; test_image_seg.py:57-60) with kernels that run inside jit on TPU.

Kernel parity: the reference's video-path resizes are torchvision TENSOR
resizes, i.e. ``F.interpolate`` with ``align_corners=False`` and no
antialias. ``bilinear`` matches that via ``jax.image.resize`` (both are
half-pixel linear). ``bicubic`` (antialias=False) is implemented here as
the EXACT torch kernel — Keys cubic with a=-0.75, half-pixel sampling,
replicated edges — because ``jax.image.resize``'s 'cubic' uses a=-0.5
(the PIL flavour), which costs ~0.2% of final-mask pixels end-to-end
(tests/test_e2e_parity.py measures it). Lowered as two dense 1-D
contractions per spatial axis — the same shape of work XLA emits for
``jax.image.resize``, and MXU-friendly. With ``antialias=True`` (PIL
semantics, e.g. the image model's input resize) it falls back to jax's
antialiased 'cubic'. ``nearest`` keeps jax's half-pixel rounding;
``nearest_torch`` reproduces torch's asymmetric ``floor(i*in/out)``
indexing (test_video_seg.py:89's first-mask downsize).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_METHODS = {
    "nearest": "nearest",
    "bilinear": "linear",
    "bicubic": "cubic",
}


def _torch_cubic_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """Dense [out, in] interpolation matrix of torch's bicubic upsample
    (Keys kernel a=-0.75, half-pixel centres, clamped/replicated edges —
    aten UpSampleBicubic2d semantics, the kernel behind the reference's
    ``TF.resize(..., BICUBIC)`` tensor calls).

    Built from traced jnp ops (iota + elementwise), NOT as a numpy
    literal: an embedded [out, in] f32 constant is multi-MB, and the axon
    relay streams large literals to the device on every execution at the
    slow D2H-class rate — a baked 8.5 MB matrix pair measured 213 ms/call
    at 1080p where this traced construction costs <1 ms of VPU work
    (mirrors how jax.image.resize builds its weight matrices)."""
    a = -0.75
    scale = in_size / out_size
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = (i + 0.5) * scale - 0.5
    i0 = jnp.floor(src)
    t = src - i0

    def kernel(x):
        x = jnp.abs(x)
        near = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
        far = a * (((x - 5.0) * x + 8.0) * x - 4.0)
        return jnp.where(x <= 1.0, near, jnp.where(x < 2.0, far, 0.0))

    cols = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    m = jnp.zeros((out_size, in_size), jnp.float32)
    for k in (-1, 0, 1, 2):
        w = kernel(t - k)                               # tap weight [out]
        idx = jnp.clip(i0 + k, 0, in_size - 1)          # replicated edges
        m = m + w[:, None] * (cols == idx[:, None])
    return m


def _apply_axis_matrix(x: jnp.ndarray, m: jnp.ndarray, axis: int,
                       compute) -> jnp.ndarray:
    # tensordot appends the output axis at the end -> ONE moveaxis instead
    # of the two a moveaxis+einsum sandwich needs (the fused video step
    # showed ~0.9 ms/frame of layout copies around these contractions)
    y = jnp.tensordot(x.astype(compute), m.astype(compute).T,
                      axes=[[axis], [0]])
    return jnp.moveaxis(y, -1, axis)


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
    if method == "nearest":
        return jax.image.resize(x, shape, method="nearest")
    if method == "nearest_torch":
        # torch F.interpolate(mode='nearest'): src = floor(i * in / out)
        # (asymmetric origin-anchored indexing, not half-pixel rounding) —
        # the reference's tensor NEAREST resizes (test_video_seg.py:89).
        for ax, (n_in, n_out) in ((h_ax, (x.shape[h_ax], out_hw[0])),
                                  (w_ax, (x.shape[w_ax], out_hw[1]))):
            if n_in != n_out:
                idx = np.floor(np.arange(n_out) * (n_in / n_out)
                               ).astype(np.int32)
                x = jnp.take(x, jnp.asarray(idx), axis=ax)
        return x
    # bf16 inputs interpolate in bf16 (the resize lowers to matmuls whose
    # MXU accumulation is f32, so only the stored taps lose precision —
    # ~0.4% on [0,1] imagery, within the bf16 production tolerance, for
    # half the HBM traffic). Everything else computes in f32.
    compute = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    if method == "bicubic" and not antialias:
        # torch-exact kernel (see module docstring)
        out = x
        if x.shape[h_ax] != out_hw[0]:
            out = _apply_axis_matrix(
                out, _torch_cubic_matrix(x.shape[h_ax], out_hw[0]), h_ax,
                compute)
        if x.shape[w_ax] != out_hw[1]:
            out = _apply_axis_matrix(
                out, _torch_cubic_matrix(x.shape[w_ax], out_hw[1]), w_ax,
                compute)
        return out.astype(x.dtype)
    jmethod = _METHODS[method]
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
