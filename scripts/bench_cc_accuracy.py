#!/usr/bin/env python
"""Accuracy eval of the coarse-grid device largest-CC vs the reference
behaviour (full-res host CC), on the bundled demo-clip masks + adversarial
variants. CPU backend (numeric comparison, no timing) — safe to run next
to nothing else.

This is the committed version of the day-8 drive experiment
(docs/ROADMAP.md): for each candidate (scale, dilation) config, the mask
is nearest-downsampled by ``scale``, largest-component-filtered, the
keep-mask dilated ``dilate`` coarse cells, nearest-upsampled, and applied;
the result is scored as IoU against `host_largest_cc` applied at full
resolution (the reference's postprocessing_pred regime, myutils/data.py:
17-37). Variants: raw propagated mask, mask + false blob (must be
removed), mask + salt noise (specks must be removed).
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    from vfloodnet_tpu.utils.palette import load_mask
    from vfloodnet_tpu.ops import resize
    from vfloodnet_tpu.pipelines.video_seg import (device_largest_cc,
                                                   host_largest_cc)

    mask_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "records", "demo_eval", "lake", "masks")
    names = sorted(os.listdir(mask_dir))
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    cases = []
    for nm in names:
        m = np.asarray(load_mask(os.path.join(mask_dir, nm)))
        if m.ndim == 3:
            m = m[..., 0]
        m = (m > 0).astype(np.uint8)
        # operating-resolution copy (480 short side), like label_small
        h, w = m.shape
        s = 480 / min(h, w)
        small = np.asarray(resize(jnp.asarray(m), (round(h * s), round(w * s)),
                                  "nearest", spatial_axes=(-2, -1)))
        cases.append((f"{nm}", small))
        blob = small.copy()                      # false blob: must vanish
        bh, bw = blob.shape
        blob[40:90, bw - 120:bw - 40] = 1
        cases.append((f"{nm}+blob", blob))
        salt = small.copy()                      # salt specks: must vanish
        idx = rng.rand(*salt.shape) < 0.002
        salt[idx] = 1
        cases.append((f"{nm}+salt", salt))

    configs = [(4, 1), (8, 1), (8, 2), (16, 1), (16, 2)]
    stats = {c: [] for c in configs}
    for name, small in cases:
        ref = host_largest_cc(small)
        for cfg in configs:
            scale, dil = cfg
            got = np.asarray(device_largest_cc(
                jnp.asarray(small), jnp.asarray(small), scale=scale,
                dilate=dil))
            inter = float(np.logical_and(got, ref).sum())
            union = float(np.logical_or(got, ref).sum())
            iou = inter / union if union else 1.0
            stats[cfg].append(iou)
            if iou < 0.995:
                print(f"  LOW {name} scale={scale} dil={dil}: {iou:.5f}")

    print(f"{len(cases)} cases ({len(names)} masks x 3 variants)")
    for cfg in configs:
        arr = np.array(stats[cfg])
        print(f"scale={cfg[0]} dilate={cfg[1]}: mean {arr.mean():.6f} "
              f"min {arr.min():.6f}")


if __name__ == "__main__":
    main()
