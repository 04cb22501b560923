#!/usr/bin/env python
"""V-FloodNet-TPU: Water Image Segmentation CLI.

Public entry point with the same flags and output tree as the reference
test_image_seg.py (SURVEY.md §3.1): segments water in a still image or a
directory of images, writing palette-PNG masks and overlays to
``<out-path>/<test-name>/{mask,overlay}``.
"""

import argparse
import os

from vfloodnet_tpu.pipelines.image_seg import run_image_segmentation
from vfloodnet_tpu.utils import gct

DEFAULT_OUT = os.path.join("./", "output", "segs")


def get_args():
    parser = argparse.ArgumentParser(
        description="V-FloodNet-TPU: Water Image Segmentation")
    parser.add_argument("--model-path",
                        default="./records/linknet_tpu",
                        type=str, metavar="PATH",
                        help="Path to the model checkpoint")
    parser.add_argument("--test-path", type=str, metavar="PATH",
                        required=True,
                        help="Folder or individual jpg/png image")
    parser.add_argument("--test-name", type=str, required=True,
                        help="Test name")
    parser.add_argument("--out-path", default=DEFAULT_OUT, type=str,
                        metavar="PATH", help="Output folder")
    parser.add_argument("--batch-size", type=int, default=4,
                        help="Images per device batch")
    return parser.parse_args()


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    args = get_args()
    run_image_segmentation(args.test_path, args.test_name, args.out_path,
                           model_path=args.model_path,
                           batch_size=args.batch_size)
    print(gct(), "Test image segmentation done.")
