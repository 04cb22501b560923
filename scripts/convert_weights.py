#!/usr/bin/env python
"""One-time weight conversion: reference checkpoints -> orbax.

Converts the reference's released checkpoints to this framework's format so
inference CLIs reproduce its accuracy:

  # AFB-URR video model (train_video_seg.py checkpoint dict or state_dict)
  python scripts/convert_weights.py afb_urr records/video_seg_*.pth records/video_seg_tpu

  # Detectron2 PointRend / Keypoint R-CNN COCO weights (.pkl)
  python scripts/convert_weights.py pointrend model_final_ba17b9.pkl records/pointrend_x101_tpu
  python scripts/convert_weights.py keypoint model_final_997cc7.pkl records/keypoint_r101_tpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vfloodnet_tpu.core.checkpoint import save_checkpoint  # noqa: E402
from vfloodnet_tpu.utils import gct  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["afb_urr", "pointrend", "keypoint"])
    p.add_argument("src", type=str)
    p.add_argument("dst", type=str)
    args = p.parse_args()

    jax.config.update("jax_platforms", "cpu")   # conversion is host work

    if args.kind == "afb_urr":
        from vfloodnet_tpu.core import convert_afb_urr_checkpoint
        variables = convert_afb_urr_checkpoint(args.src)
    else:
        from vfloodnet_tpu.core.convert_d2 import convert_d2_checkpoint
        if args.kind == "pointrend":
            variables = convert_d2_checkpoint(args.src, with_masks=True,
                                              with_pointrend=True)
        else:
            variables = convert_d2_checkpoint(args.src, with_keypoints=True)

    variables = jax.tree.map(jnp.asarray, variables)
    save_checkpoint(args.dst, variables)
    print(gct(), f"Converted {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
