#!/usr/bin/env python
"""V-FloodNet-TPU: Water Video Segmentation CLI.

Public entry point with the same flags and output tree as the reference
test_video_seg.py (SURVEY.md §3.2): memory-propagated per-frame water
segmentation over a frame directory, bootstrapping the first-frame mask with
the image model when missing.
"""

import argparse
import os

from vfloodnet_tpu.pipelines.loaders import load_afb_urr
from vfloodnet_tpu.pipelines.video_seg import run_video_segmentation
from vfloodnet_tpu.utils import gct


def get_args():
    parser = argparse.ArgumentParser(
        description="V-FloodNet-TPU: Water Video Segmentation")
    parser.add_argument("--gpu", type=int, default=0,
                        help="Ignored (TPU build); kept for reference CLI compatibility.")
    parser.add_argument("--budget", type=int, default=250000,
                        help="Max number of features in the feature bank.")
    parser.add_argument("--viz", action="store_true", default=True,
                        help="Visualize data.")
    parser.add_argument("--model-path", type=str,
                        default="records/video_seg_tpu",
                        help="Path to the checkpoint (orbax dir or torch .pth)")
    parser.add_argument("--image-model-path", type=str,
                        default="./records/linknet_tpu",
                        help="Image model for first-frame bootstrap")
    parser.add_argument("--update-rate", type=float, default=0.1,
                        help="Impact of merging new features.")
    parser.add_argument("--merge-thres", type=float, default=0.95,
                        help="Merge if similarity is higher, else append.")
    parser.add_argument("--downsample", type=int, default=480,
                        help="Short-side operating resolution.")
    parser.add_argument("--postprocess", type=str, default="auto",
                        choices=["auto", "host", "device", "none"],
                        help="Largest-CC cleanup: auto (default: device on "
                             "accelerator + few-CPU hosts, else host), host "
                             "(overlapped writer pool), device (mask stays "
                             "device-resident), none.")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="Checkpoint the bank every K frames "
                             "(long-video fault tolerance; 0 = off)")
    parser.add_argument("--memorize-every", type=int, default=1,
                        help="Memorize/update the bank only every K-th "
                             "frame (1 = reference behaviour; >1 trades "
                             "some accuracy for throughput)")
    parser.add_argument("--cc-scale", type=int, default=16,
                        help="Device largest-CC runs at 1/K of the "
                             "operating resolution (8 = default: IoU >= "
                             "0.9999 vs full-res CC with dilated keep-mask)")
    parser.add_argument("--test-path", type=str, required=True,
                        help="Video frames directory")
    parser.add_argument("--test-name", type=str, required=True,
                        help="Video name")
    return parser.parse_args()


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    args = get_args()
    print(gct(), "Args =", args)
    assert os.path.isdir(args.test_path)

    model, variables = load_afb_urr(args.model_path)
    run_video_segmentation(
        args.test_path, args.test_name,
        model=model, variables=variables,
        budget=args.budget, update_rate=args.update_rate,
        merge_thres=args.merge_thres, downsample=args.downsample,
        viz=args.viz, postprocess=args.postprocess,
        image_model_path=args.image_model_path,
        checkpoint_every=args.checkpoint_every,
        memorize_every=args.memorize_every, cc_scale=args.cc_scale)
    print(gct(), "Test video segmentation done.")
