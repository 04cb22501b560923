"""Training loops shared by the train CLIs.

Checkpointing layout mirrors the reference trainers (train_video_seg.py:
159-177, train_image_seg.py:179-197): per-epoch checkpoints plus final/best,
implemented with orbax; a source snapshot is saved into the log dir
(reference myutils save_scripts)."""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import restore_checkpoint, save_checkpoint
from ..data import BatchLoader
from ..utils import AvgMeter, gct, save_scripts
from ..utils.logging import MetricWriter


def run_video_training(model, variables, cfg, dataset, log_dir: str,
                       batch_size: int = 1, resume: Optional[str] = None,
                       mesh=None, log_every: int = 10) -> str:
    from .train_video import (init_video_train_state, make_video_train_step,
                              shard_train_state)

    os.makedirs(log_dir, exist_ok=True)
    save_scripts(log_dir, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))

    loader = BatchLoader(dataset, batch_size, shuffle=True, seed=cfg.seed)
    steps_per_epoch = max(len(loader), 1)
    state, tx = init_video_train_state(model, variables, cfg, steps_per_epoch)
    start_epoch = 0
    if resume and os.path.exists(resume):
        state = restore_checkpoint(resume, target=state)
        start_epoch = int(state.step) // steps_per_epoch
        print(gct(), f"Resumed from {resume} at epoch {start_epoch}")
    if mesh is not None:
        state = shard_train_state(state, mesh)
    step_fn = make_video_train_step(model, tx, cfg, mesh=mesh)

    metrics = MetricWriter(log_dir)
    best_loss = float("inf")
    best_path = os.path.join(log_dir, "best")
    for epoch in range(start_epoch, cfg.epochs):
        meter = AvgMeter()
        t0 = time.time()
        for bi, (frames, masks, obj_n) in enumerate(loader.epoch(epoch)):
            state, loss = step_fn(state, jnp.asarray(frames),
                                  jnp.asarray(masks))
            meter.update(float(loss))
            if bi % log_every == 0:
                print(gct(), f"epoch {epoch} step {bi}/{steps_per_epoch} "
                      f"loss {meter.avg:.4f}")
                metrics.write("train", step=int(state.step), loss=meter.avg,
                              epoch=epoch)
        dt = time.time() - t0
        print(gct(), f"epoch {epoch} done: loss {meter.avg:.4f} ({dt:.1f}s)")
        metrics.write("epoch", step=int(state.step), loss=meter.avg,
                      epoch=epoch, seconds=dt)
        save_checkpoint(os.path.join(log_dir, "final"), state)
        if meter.avg < best_loss:
            best_loss = meter.avg
            save_checkpoint(best_path, state)
    metrics.close()
    return best_path


def run_image_training(model, variables, cfg, dataset, log_dir: str,
                       val_dataset=None, resume: Optional[str] = None,
                       mesh=None, log_every: int = 10) -> str:
    """Image trainer loop. With ``val_dataset``, a validation epoch runs
    after each training epoch and 'best' tracks validation IoU (reference
    train_image_seg.py's train/valid epoch runners)."""
    from .train_image import (init_image_train_state, iou_metric,
                              make_image_train_step)

    os.makedirs(log_dir, exist_ok=True)
    loader = BatchLoader(dataset, cfg.batch_size, shuffle=True, seed=cfg.seed)
    steps_per_epoch = max(len(loader), 1)
    state, tx = init_image_train_state(model, variables, cfg, steps_per_epoch)
    start_epoch = 0
    if resume and os.path.exists(resume):
        state = restore_checkpoint(resume, target=state)
        start_epoch = int(state.step) // steps_per_epoch
        print(gct(), f"Resumed from {resume} at epoch {start_epoch}")
    step_fn = make_image_train_step(model, tx, mesh=mesh,
                                    update_bn=getattr(cfg, "update_bn",
                                                      False))

    val_loader = None
    eval_fn = None
    if val_dataset is not None:
        val_loader = BatchLoader(val_dataset, cfg.batch_size, shuffle=False,
                                 seed=cfg.seed, drop_last=False)
        eval_fn = jax.jit(lambda params, stats, images: model.apply(
            {"params": params, "batch_stats": stats}, images)[..., 0])

    metrics = MetricWriter(log_dir)
    history = []
    best_iou = -1.0
    best_path = os.path.join(log_dir, "best")
    for epoch in range(start_epoch, cfg.epochs):
        loss_m, iou_m = AvgMeter(), AvgMeter()
        for bi, (images, masks) in enumerate(loader.epoch(epoch)):
            state, loss, iou = step_fn(state, jnp.asarray(images),
                                       jnp.asarray(masks))
            loss_m.update(float(loss))
            iou_m.update(float(iou))
            if bi % log_every == 0:
                print(gct(), f"epoch {epoch} step {bi}/{steps_per_epoch} "
                      f"dice {loss_m.avg:.4f} iou {iou_m.avg:.4f}")

        select_iou = iou_m.avg
        if val_loader is not None:
            val_m = AvgMeter()
            for images, masks in val_loader.epoch(0):
                if images.shape[0] != cfg.batch_size:
                    continue
                prob = eval_fn(state.params, state.batch_stats,
                               jnp.asarray(images))
                val_m.update(float(iou_metric(prob, jnp.asarray(masks))))
            select_iou = val_m.avg
            print(gct(), f"epoch {epoch}: val iou {val_m.avg:.4f}")

        history.append((loss_m.avg, iou_m.avg))
        print(gct(), f"epoch {epoch}: dice {loss_m.avg:.4f} iou {iou_m.avg:.4f}")
        metrics.write("epoch", step=int(state.step), epoch=epoch,
                      dice=loss_m.avg, iou=iou_m.avg, select_iou=select_iou)
        save_checkpoint(os.path.join(log_dir, "final"), state)
        if select_iou > best_iou:
            best_iou = select_iou
            save_checkpoint(best_path, state)
    metrics.close()
    _plot_curves(history, log_dir)
    return best_path


def _plot_curves(history, log_dir):
    """Loss/IoU curves per epoch (reference train_image_seg.py:211-225)."""
    if not history:
        return
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        losses, ious = zip(*history)
        fig, ax = plt.subplots(1, 2, figsize=(10, 4))
        ax[0].plot(losses); ax[0].set_title("dice loss")
        ax[1].plot(ious); ax[1].set_title("IoU@0.5")
        fig.savefig(os.path.join(log_dir, "curves.png"), dpi=120)
        plt.close(fig)
    except Exception as e:   # plotting must never kill a training run
        print(gct(), f"curve plotting failed: {e}")
