#!/usr/bin/env python
"""Comparative eval: PSPNet (ATLANTIS, 56 classes) mapped to binary water.

Same harness contract as the reference test_atlantis_model.py: pad to
--padding-size, forward, upsample, argmax, strip padding, map the water
classes to a binary mask, save colorized + overlay outputs.
"""

import argparse
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.models.pspnet import PSPNet
from vfloodnet_tpu.utils import add_overlay, gct, load_image, save_seg_mask

# ATLANTIS water-related class ids (reference test_atlantis_model.py:16)
WATER_LABELS = (15, 16, 17, 18, 19, 31, 33, 34, 35, 37, 44, 53, 54)


def get_arguments():
    p = argparse.ArgumentParser(description="Testing PSPNet on ATLANTIS")
    p.add_argument("--model", type=str, default="PSPNet")
    p.add_argument("--num-classes", type=int, default=56)
    p.add_argument("--padding-size", type=int, default=768)
    p.add_argument("--data-directory", type=str, default="./atlantis")
    p.add_argument("--restore-from", type=str,
                   default="./records/atlantis_pspnet_tpu")
    p.add_argument("--save-path", type=str,
                   default="./output/atlantis_model_test_results")
    return p.parse_args()


def main(args):
    if args.model != "PSPNet":
        raise NotImplementedError(args.model)
    model = PSPNet(num_classes=args.num_classes)

    if os.path.isdir(args.restore_from):
        from vfloodnet_tpu.core.checkpoint import restore_checkpoint
        dummy = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        variables = restore_checkpoint(args.restore_from, target=dummy)
    else:
        import warnings
        warnings.warn(f"No checkpoint at {args.restore_from}; random init.")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))

    os.makedirs(args.save_path, exist_ok=True)
    pad = args.padding_size

    @jax.jit
    def forward(img):
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        _, logits = model.apply(variables, ((img - mean) / std)[None])
        n, h, w, c = logits.shape
        up = jax.image.resize(logits, (n, pad, pad, c), method="linear")
        return jnp.argmax(up[0], axis=-1).astype(jnp.uint8)

    paths = sorted(glob(os.path.join(args.data_directory, "*.jpg"))
                   + glob(os.path.join(args.data_directory, "*.png")))
    water_set = np.zeros(args.num_classes, bool)
    water_set[list(WATER_LABELS)] = True

    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        img = np.asarray(load_image(path), np.float32) / 255.0
        h, w = img.shape[:2]
        # top/right padding like the reference (test_atlantis_model.py:63-66)
        padded = np.zeros((pad, pad, 3), np.float32)
        top_pad, right_pad = pad - h, pad - w
        if top_pad < 0 or right_pad < 0:
            scale = pad / max(h, w)
            import cv2
            img = cv2.resize(img, (int(w * scale), int(h * scale)))
            h, w = img.shape[:2]
            top_pad, right_pad = pad - h, pad - w
        padded[top_pad:, :w] = img

        pred = np.asarray(jax.device_get(forward(jax.device_put(padded))))
        pred = pred[top_pad:, :w] if right_pad else pred[top_pad:]

        save_seg_mask(pred, os.path.join(args.save_path,
                                         f"{name}_color.png"))
        bin_pred = water_set[pred].astype(np.uint8)
        bgr = (img[..., ::-1] * 255).astype(np.uint8)
        overlay = add_overlay(np.ascontiguousarray(bgr), bin_pred)
        from PIL import Image
        Image.fromarray(overlay[..., ::-1]).save(
            os.path.join(args.save_path, f"{name}_water.png"))

    print(gct(), f"Processed {len(paths)} images -> {args.save_path}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main(get_arguments())
