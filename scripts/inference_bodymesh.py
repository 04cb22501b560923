#!/usr/bin/env python
"""Body-mesh inference CLI.

Drop-in equivalent of the reference's METRO driver
(scripts/inference_bodymesh.py run inside the MeshTransformer submodule):
regresses body-mesh vertices for each 224x224 person crop in
--image-file-or-path and writes ``<name>_pred.txt`` JSON files with the
orthographically-projected 2-D vertices in [-1, 1] — the exact contract the
depth pipeline consumes (estimation/object_detection.py:348-350). Here the
model runs in-process on TPU (vfloodnet_tpu.models.metro); the subprocess +
file-IPC hop of the reference exists only for compatibility with external
callers of this script.
"""

import argparse
import json
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.models.metro import load_default_mesh_regressor  # noqa: E402
from vfloodnet_tpu.utils import gct, load_image  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_file_or_path", type=str, required=True)
    p.add_argument("--resume_checkpoint", type=str, default=None,
                   help="Converted body-mesh checkpoint dir")
    args = p.parse_args()

    regressor = load_default_mesh_regressor(args.resume_checkpoint)

    path = args.image_file_or_path
    if os.path.isfile(path):
        paths = [path]
    else:
        paths = sorted(glob(os.path.join(path, "*.png"))
                       + glob(os.path.join(path, "*.jpg")))
        paths = [p for p in paths if not p.endswith("_pred.txt")]

    for img_path in paths:
        img = np.asarray(load_image(img_path), np.uint8)[..., ::-1]  # BGR
        pts = regressor(img)
        base = os.path.splitext(img_path)[0]
        with open(base + "_pred.txt", "w") as f:
            json.dump(np.asarray(pts, np.float64).tolist(), f)
    print(gct(), f"Wrote predictions for {len(paths)} crop(s).")


if __name__ == "__main__":
    main()
