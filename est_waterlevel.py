#!/usr/bin/env python
"""V-FloodNet-TPU: Water-level estimation CLI.

Same dispatcher contract as the reference est_waterlevel.py: globs input
frames and the segmentation-stage masks, then routes --opt
{stopsign, people} to detection-based depth estimation and --opt ref to
reference-object tracking.
"""

import argparse
import os
from glob import glob

from vfloodnet_tpu.utils import gct


def get_args():
    p = argparse.ArgumentParser(description="V-FloodNet-TPU: Water level "
                                "estimation")
    p.add_argument("--test-path", type=str, required=True,
                   help="Input frames directory")
    p.add_argument("--test-name", type=str, required=True)
    p.add_argument("--opt", type=str, required=True,
                   choices=["stopsign", "people", "ref"])
    p.add_argument("--seg-dir", type=str, default="./output/segs",
                   help="Segmentation-stage output root")
    p.add_argument("--out-dir", type=str, default="./output/waterlevel")
    p.add_argument("--record-dir", type=str, default="./records/groundtruth",
                   help="Stored calibration records (homo_mat.txt, "
                        "ref_bbox.txt)")
    p.add_argument("--streaming", action="store_true",
                   help="ref mode: fused seg+waterline on device (no "
                        "inter-stage PNGs); runs segmentation itself")
    p.add_argument("--model-path", type=str, default="records/video_seg_tpu",
                   help="Video model for --streaming")
    p.add_argument("--det-model-path", type=str, default=None,
                   help="Detector checkpoint dir (orbax; an optional "
                        "rcnn_config.json sidecar selects the variant)")
    return p.parse_args()


def main():
    args = get_args()
    img_list = sorted(glob(os.path.join(args.test_path, "*.jpg"))
                      + glob(os.path.join(args.test_path, "*.png")))
    mask_dir = os.path.join(args.seg_dir, args.test_name, "mask")
    water_mask_list = [
        os.path.join(mask_dir,
                     os.path.splitext(os.path.basename(p))[0] + ".png")
        for p in img_list]

    out_dir = os.path.join(args.out_dir, f"{args.test_name}_{args.opt}")
    os.makedirs(out_dir, exist_ok=True)

    if args.opt in ("stopsign", "people"):
        from vfloodnet_tpu.pipelines.object_detection import \
            est_by_obj_detection
        out = est_by_obj_detection(img_list, water_mask_list, out_dir,
                                   args.opt,
                                   det_model_path=args.det_model_path)
        print(gct(), f"Depth estimates written to {out}")
    elif args.streaming:
        from vfloodnet_tpu.pipelines.loaders import load_afb_urr
        from vfloodnet_tpu.pipelines.streaming_waterlevel import \
            run_streaming_waterlevel
        model, variables = load_afb_urr(args.model_path)
        out = run_streaming_waterlevel(args.test_path, args.test_name,
                                       out_dir, args.record_dir, model,
                                       variables)
        print(gct(), f"Water levels written to {out}")
    else:
        from vfloodnet_tpu.pipelines.reference_tracking import \
            est_by_reference
        out = est_by_reference(img_list, water_mask_list, out_dir,
                               args.record_dir, args.test_name)
        print(gct(), f"Water levels written to {out}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
    print(gct(), "Water level estimation done.")
