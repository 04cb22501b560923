#!/usr/bin/env python
"""Convert labelme JSON annotations to palette PNG masks (reference
scripts/cvt_labelme.py, without shelling out to labelme_json_to_dataset)."""

import argparse
import json
import os
import sys
from glob import glob

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.utils import save_seg_mask  # noqa: E402


def labelme_to_mask(json_path: str, water_labels=("water",)) -> np.ndarray:
    with open(json_path) as f:
        ann = json.load(f)
    h, w = ann["imageHeight"], ann["imageWidth"]
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for shape in ann.get("shapes", []):
        label = 1 if shape.get("label", "") in water_labels else 2
        pts = [tuple(p) for p in shape["points"]]
        if shape.get("shape_type", "polygon") == "polygon" and len(pts) >= 3:
            draw.polygon(pts, fill=label)
    return np.asarray(img, np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json-dir", type=str, required=True)
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--water-labels", type=str, default="water",
                   help="Comma-separated labelme labels mapped to water")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    labels = tuple(args.water_labels.split(","))
    n = 0
    for path in sorted(glob(os.path.join(args.json_dir, "*.json"))):
        mask = labelme_to_mask(path, labels)
        base = os.path.splitext(os.path.basename(path))[0]
        save_seg_mask(mask, os.path.join(args.out_dir, base + ".png"))
        n += 1
    print(f"Converted {n} annotations -> {args.out_dir}")


if __name__ == "__main__":
    main()
