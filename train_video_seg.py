#!/usr/bin/env python
"""V-FloodNet-TPU: AFB-URR video segmentation trainer CLI.

Same training recipe as the reference train_video_seg.py (SURVEY.md §3.5):
clip_n-frame pseudo-videos from annotated stills, CE + 0.5*uncertainty loss,
AdamW 1e-5, step decay; TPU-native DP/TP sharding over a device mesh.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp

from vfloodnet_tpu.data import WaterVideoTrainDataset
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.parallel import make_mesh
from vfloodnet_tpu.train import VideoTrainConfig
from vfloodnet_tpu.train.loops import run_video_training
from vfloodnet_tpu.utils import gct


def get_args():
    p = argparse.ArgumentParser(description="V-FloodNet-TPU video-seg trainer")
    p.add_argument("--gpu", type=int, default=0,
                   help="Ignored (TPU build); kept for reference CLI compatibility.")
    p.add_argument("--dataset", type=str, required=True,
                   help="Dataset root (train_imgs.txt + JPEGImages/Annotations)")
    p.add_argument("--log", type=str, default=None, help="Log dir")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lu", type=float, default=0.5,
                   help="Uncertainty loss weight")
    p.add_argument("--scheduler-step", type=int, default=25)
    p.add_argument("--total-epochs", type=int, default=100)
    p.add_argument("--clip-n", type=int, default=6)
    p.add_argument("--obj-n", type=int, default=3)
    p.add_argument("--output-size", type=int, default=400)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard clips over all devices")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialise the per-clip forward in the backward "
                        "pass (less HBM, more FLOPs - bigger clips/batches)")
    return p.parse_args()


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    args = get_args()
    print(gct(), "Args =", args)
    cfg = VideoTrainConfig(
        lr=args.lr, lambda_u=args.lu,
        scheduler_step_epochs=args.scheduler_step, epochs=args.total_epochs,
        clip_n=args.clip_n, max_obj_n=args.obj_n,
        output_size=args.output_size, seed=args.seed, remat=args.remat)

    log_dir = args.log or os.path.join(
        "logs", time.strftime("%Y%m%d-%H%M%S") + "_video_seg")

    dataset = WaterVideoTrainDataset(
        args.dataset, output_size=cfg.output_size, clip_n=cfg.clip_n,
        max_obj_n=cfg.max_obj_n, seed=cfg.seed)

    model = AFBURR()
    sz = cfg.output_size
    variables = model.init(jax.random.PRNGKey(cfg.seed),
                           jnp.zeros((sz, sz, 3)),
                           jnp.zeros((cfg.max_obj_n, sz, sz)),
                           method=model.init_all)

    mesh = make_mesh() if args.data_parallel else None
    best = run_video_training(model, variables, cfg, dataset, log_dir,
                              batch_size=args.batch_size,
                              resume=args.resume, mesh=mesh)
    print(gct(), f"Training done. Best checkpoint: {best}")
