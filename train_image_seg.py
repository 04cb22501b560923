#!/usr/bin/env python
"""V-FloodNet-TPU: LinkNet image segmentation trainer CLI.

Same recipe as the reference train_image_seg.py: Dice loss + IoU@0.5,
Adam 1e-4 -> 1e-5 at half the epochs; TPU-native batched step.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp

from vfloodnet_tpu.data import WaterImageDataset
from vfloodnet_tpu.models import LinkNet
from vfloodnet_tpu.parallel import make_mesh
from vfloodnet_tpu.train import ImageTrainConfig
from vfloodnet_tpu.train.loops import run_image_training
from vfloodnet_tpu.utils import gct


def get_args():
    p = argparse.ArgumentParser(description="V-FloodNet-TPU image-seg trainer")
    p.add_argument("--gpu", type=int, default=0,
                   help="Ignored (TPU build); kept for reference CLI compatibility.")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--encoder", type=str, default="efficientnet-b4",
                   help="Encoder name (efficientnet-b4 supported)")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--input-size", type=int, default=416)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--data-parallel", action="store_true")
    return p.parse_args()


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    args = get_args()
    print(gct(), "Args =", args)
    if args.encoder != "efficientnet-b4":
        raise NotImplementedError(f"encoder {args.encoder}")

    cfg = ImageTrainConfig(lr=args.lr, epochs=args.epochs,
                           batch_size=args.batch_size,
                           input_size=args.input_size, seed=args.seed)
    log_dir = args.log or os.path.join(
        "logs", time.strftime("%Y%m%d-%H%M%S") + "_image_seg")

    dataset = WaterImageDataset("train_offline", args.dataset,
                                input_size=cfg.input_size, seed=cfg.seed)
    val_dataset = None
    if os.path.exists(os.path.join(args.dataset, "val_imgs.txt")):
        val_dataset = WaterImageDataset("train_offline", args.dataset,
                                        input_size=cfg.input_size,
                                        dataset_file="val_imgs.txt",
                                        seed=cfg.seed)
    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(cfg.seed),
                           jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))

    mesh = make_mesh() if args.data_parallel else None
    best = run_image_training(model, variables, cfg, dataset, log_dir,
                              val_dataset=val_dataset,
                              resume=args.resume, mesh=mesh)
    print(gct(), f"Training done. Best checkpoint: {best}")
