#!/usr/bin/env python
"""Batch water-level estimation (reference scripts/batch_est_waterlevel.py).

Runs est_waterlevel's ref pipeline over every video under --benchmark-root.
"""

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.pipelines.reference_tracking import est_by_reference  # noqa: E402
from vfloodnet_tpu.utils import gct  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--benchmark-root", type=str, required=True)
    p.add_argument("--seg-dir", type=str, default="./output/segs")
    p.add_argument("--out-dir", type=str, default="./output/waterlevel")
    p.add_argument("--record-dir", type=str, default="./records/groundtruth")
    args = p.parse_args()

    names = sorted(d for d in os.listdir(args.benchmark_root)
                   if os.path.isdir(os.path.join(args.benchmark_root, d)))
    for name in names:
        print(gct(), f"=== {name} ===")
        frames = sorted(
            glob(os.path.join(args.benchmark_root, name, "*.jpg"))
            + glob(os.path.join(args.benchmark_root, name, "*.png")))
        mask_dir = os.path.join(args.seg_dir, name, "mask")
        masks = [os.path.join(
            mask_dir, os.path.splitext(os.path.basename(f))[0] + ".png")
            for f in frames]
        out_dir = os.path.join(args.out_dir, f"{name}_ref")
        os.makedirs(out_dir, exist_ok=True)
        est_by_reference(frames, masks, out_dir, args.record_dir, name)


if __name__ == "__main__":
    main()
    print(gct(), "Batch water-level estimation done.")
