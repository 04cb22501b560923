#!/usr/bin/env python
"""Extract frames from a video file (reference scripts/cvt_video_to_imgs.py:
stride-N frame extraction)."""

import argparse
import os

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video-path", type=str, required=True)
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--stride", type=int, default=3)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    cap = cv2.VideoCapture(args.video_path)
    idx = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % args.stride == 0:
            cv2.imwrite(os.path.join(args.out_dir, f"{saved:05d}.jpg"), frame)
            saved += 1
        idx += 1
    cap.release()
    print(f"Extracted {saved} frames (stride {args.stride}) -> {args.out_dir}")


if __name__ == "__main__":
    main()
