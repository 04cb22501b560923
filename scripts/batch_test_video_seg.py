#!/usr/bin/env python
"""Batch video segmentation over a benchmark directory tree.

Same contract as the reference scripts/batch_test_video_seg.py:40-47: each
subdirectory of --benchmark-root is a video named by its directory.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.pipelines.loaders import load_afb_urr  # noqa: E402
from vfloodnet_tpu.pipelines.video_seg import run_video_segmentation  # noqa: E402
from vfloodnet_tpu.utils import gct  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--benchmark-root", type=str, required=True)
    p.add_argument("--out-dir", type=str, default="./output/segs")
    p.add_argument("--model-path", type=str, default="records/video_seg_tpu")
    p.add_argument("--budget", type=int, default=250000)
    p.add_argument("--streams", type=int, default=1,
                   help="Propagate this many same-resolution videos "
                        "simultaneously (one vmapped device step).")
    p.add_argument("--cc-scale", type=int, default=8,
                   help="Device largest-CC runs at 1/K of the operating "
                        "resolution (8 = default: IoU >= 0.9998 vs "
                        "full-res CC with dilated keep-mask).")
    p.add_argument("--memorize-every", type=int, default=1,
                   help="Memorize/bank-update every Kth frame (1 = every "
                        "frame, matching the reference; >1 trades a little "
                        "accuracy for throughput).")
    args = p.parse_args()

    model, variables = load_afb_urr(args.model_path)
    names = sorted(d for d in os.listdir(args.benchmark_root)
                   if os.path.isdir(os.path.join(args.benchmark_root, d)))
    if args.streams > 1:
        from vfloodnet_tpu.pipelines.video_seg_batch import \
            run_video_segmentation_batch
        for start in range(0, len(names), args.streams):
            group = names[start:start + args.streams]
            print(gct(), f"=== streams: {group} ===")
            run_video_segmentation_batch(
                [os.path.join(args.benchmark_root, n) for n in group],
                group, args.out_dir, model, variables, budget=args.budget,
                memorize_every=args.memorize_every, cc_scale=args.cc_scale)
        return
    for name in names:
        print(gct(), f"=== {name} ===")
        run_video_segmentation(os.path.join(args.benchmark_root, name), name,
                               args.out_dir, model=model, variables=variables,
                               budget=args.budget,
                               memorize_every=args.memorize_every)


if __name__ == "__main__":
    main()
    print(gct(), "Batch video segmentation done.")
