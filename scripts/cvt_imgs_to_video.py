#!/usr/bin/env python
"""Render a frame directory into an mp4 (reference scripts/
cvt_imgs_to_video.py; per-site fps comes from the site profiles)."""

import argparse
import os
import sys
from glob import glob

import cv2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.core.config import site_profile  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-dir", type=str, required=True)
    p.add_argument("--out-path", type=str, required=True)
    p.add_argument("--fps", type=float, default=None,
                   help="Defaults to the site profile fps")
    args = p.parse_args()

    name = os.path.basename(os.path.normpath(args.img_dir))
    fps = args.fps or site_profile(name).fps

    paths = sorted(glob(os.path.join(args.img_dir, "*.jpg"))
                   + glob(os.path.join(args.img_dir, "*.png")))
    if not paths:
        raise FileNotFoundError(args.img_dir)
    first = cv2.imread(paths[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(args.out_path,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for path in paths:
        img = cv2.imread(path)
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        writer.write(img)
    writer.release()
    print(f"Wrote {len(paths)} frames @ {fps} fps -> {args.out_path}")


if __name__ == "__main__":
    main()
