"""Still-image water segmentation pipeline (LinkNet + EfficientNet-B4).

Capability parity with the reference test_image_seg.py:44-151: resize to
416x416 (PIL, matching ``tf.Resize`` on a PIL image), ImageNet-normalise,
forward, resize the sigmoid map back to the original size, threshold,
largest-connected-component cleanup, palette PNG + overlay.

TPU-native: images batch to a fixed [B, 416, 416, 3] device input — one
compiled graph regardless of source resolutions — and the per-image
upsample/threshold/CC/PNG tail runs in host writer threads, overlapped with
the next batch's device forward.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from functools import lru_cache, partial
from glob import glob
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .. import ops
from ..utils import gct, load_image, save_overlay, save_seg_mask

MODEL_DIMS = (416, 416)  # reference test_image_seg.py:79


def _build_pipeline(model, variables, postprocess: bool = True):
    """Single-image fully-device path (resize-in, forward, resize-back,
    threshold, largest-CC) — used when masks must stay device-resident."""
    if getattr(model, "dtype", jnp.float32) != jnp.float32:
        from .loaders import cast_floating_params
        variables = cast_floating_params(variables, model.dtype)
    # weights as jit arguments (compile-cache survives checkpoint changes;
    # see VideoSegEngine.__init__)
    variables = jax.device_put(variables)

    @jax.jit
    def run_impl(variables, img01: jnp.ndarray):
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
    return lambda img01: run_impl(variables, img01)


@lru_cache(maxsize=8)
def _jit_forward(model):
    """Process-lifetime jitted batch forward for ``model`` (flax modules
    hash by structure, so reloading the same architecture reuses the
    compiled executable; weights are passed as arguments)."""
    @jax.jit
    def fwd(variables, batch01):                        # [B, 416, 416, 3]
        return model.apply(variables, batch01)[..., 0]  # [B, 416, 416]
    return fwd


@lru_cache(maxsize=8)
def _jit_forward_device_tail(model, postprocess: bool):
    """Forward + full device tail: one dispatch, uint8 labels out (the
    [B, H, W] label D2H is ~8x smaller than the f32 prob maps the host
    tail needs). One compiled graph per output size (static out_hw), reused
    across run_image_segmentation calls."""
    @partial(jax.jit, static_argnums=(2,))
    def fwd_tail(variables, batch01, out_hw):
        probs = model.apply(variables, batch01)[..., 0]
        label416 = (probs > 0.5).astype(jnp.uint8)
        up = ops.resize(probs, out_hw, "bilinear", spatial_axes=(-2, -1))
        label = (up > 0.5).astype(jnp.uint8)
        if postprocess:
            keep = jax.vmap(ops.largest_connected_component)(label416)
            keep_full = ops.resize(keep, out_hw, "nearest",
                                   spatial_axes=(-2, -1))
            label = label * keep_full
        from .video_seg import pack_bits
        return jax.vmap(pack_bits)(label)    # 8x smaller D2H
    return fwd_tail


def _host_tail(prob416: np.ndarray, orig_hw: Tuple[int, int],
               postprocess: bool) -> np.ndarray:
    """Reference post-processing tail on host: upsample prob to the original
    size (bilinear), threshold at 0.5, largest-CC."""
    import cv2
    up = cv2.resize(prob416, (orig_hw[1], orig_hw[0]),
                    interpolation=cv2.INTER_LINEAR)
    label = (up > 0.5).astype(np.uint8)
    if postprocess:
        from .video_seg import host_largest_cc
        label = host_largest_cc(label)
    return label


def run_image_segmentation(test_path: str, test_name: str,
                           out_path: str = "./output/segs",
                           model_path: Optional[str] = None,
                           model=None, variables=None,
                           batch_size: int = 4,
                           postprocess: bool = True,
                           tail: str = "auto") -> list:
    """Segment one image file or a directory of images.

    ``tail``: where the resize-back + threshold + largest-CC cleanup runs —
    'host' (cv2 at full resolution, the reference's exact path,
    test_image_seg.py:108-121), 'device' (jitted: component filter at
    model resolution with upsampled keep-mask, same design as the video
    engine's device CC; one graph per output size), or 'auto' (device when
    an accelerator backs the process and the host is too weak to overlap
    the cv2 tail — same policy as video_seg.resolve_postprocess).

    Returns list of (mask_path, overlay_path).
    """
    if model is None:
        from ..models.linknet import load_linknet
        model, variables = load_linknet(model_path)

    if tail == "auto":
        accel = jax.devices()[0].platform != "cpu"
        tail = "device" if accel and (os.cpu_count() or 1) < 4 else "host"

    mask_out = os.path.join(out_path, test_name, "mask")
    overlay_out = os.path.join(out_path, test_name, "overlay")
    os.makedirs(mask_out, exist_ok=True)
    os.makedirs(overlay_out, exist_ok=True)

    if os.path.isfile(test_path):
        paths = [test_path]
    else:
        paths = sorted(glob(os.path.join(test_path, "*.jpg"))
                       + glob(os.path.join(test_path, "*.png")))

    b = max(1, min(batch_size, len(paths)))

    if getattr(model, "dtype", jnp.float32) != jnp.float32:
        from .loaders import cast_floating_params
        variables = cast_floating_params(variables, model.dtype)
    # weights as jit arguments (compile-cache survives checkpoint changes;
    # see VideoSegEngine.__init__)
    variables = jax.device_put(variables)

    # jitted executables cached at module level keyed on (model,
    # postprocess): a fresh jax.jit per call would retrace/recompile the
    # full forward+tail graph on every repeat invocation in one process —
    # costly on the remote-compile relay (ADVICE r4).
    _forward = _jit_forward(model)
    _forward_device_tail = _jit_forward_device_tail(model, postprocess)

    def forward(batch01):
        return _forward(variables, batch01)

    writer = ThreadPoolExecutor(max_workers=2)
    results: List[Tuple[str, str]] = []
    futures = []

    def _write(path, prob416, img_np, label=None):
        if label is None:
            label = _host_tail(prob416, img_np.shape[:2], postprocess)
        base = os.path.splitext(os.path.basename(path))[0]
        mask_path = os.path.join(mask_out, base + ".png")
        overlay_path = os.path.join(overlay_out, base + ".png")
        save_seg_mask(label, mask_path)
        save_overlay(img_np, label, overlay_path)
        return mask_path, overlay_path

    for start in range(0, len(paths), b):
        chunk = paths[start:start + b]
        imgs, inputs = [], []
        for path in chunk:
            pil = load_image(path)
            imgs.append(np.asarray(pil, np.uint8))
            resized = pil.resize(MODEL_DIMS[::-1], Image.BILINEAR)
            inputs.append(np.asarray(resized, np.float32) / 255.0)
        while len(inputs) < b:                          # pad last batch
            inputs.append(inputs[-1])
        batch = jax.device_put(np.stack(inputs))
        same_hw = all(im.shape[:2] == imgs[0].shape[:2] for im in imgs)
        if tail == "device" and same_hw:
            labels = _forward_device_tail(variables, batch,
                                          tuple(imgs[0].shape[:2]))
            labels.copy_to_host_async()
            from .video_seg import unpack_bits
            labels_np = unpack_bits(np.asarray(jax.device_get(labels)),
                                    imgs[0].shape[1])
            for j, path in enumerate(chunk):
                futures.append(writer.submit(_write, path, None, imgs[j],
                                             labels_np[j]))
        else:
            probs = forward(batch)
            probs.copy_to_host_async()
            probs_np = np.asarray(jax.device_get(probs))
            for j, path in enumerate(chunk):
                futures.append(writer.submit(_write, path, probs_np[j],
                                             imgs[j]))

    for f in futures:
        results.append(f.result())
    writer.shutdown()
    print(gct(), f"Segmented {len(paths)} image(s) -> {mask_out}")
    return results
