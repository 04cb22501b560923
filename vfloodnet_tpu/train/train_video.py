"""AFB-URR trainer.

Same objective as the reference (train_video_seg.py:50-88): per clip, build a
bank from frame 0 (memorize), segment the remaining frames against it, and
minimise cross-entropy + lambda_u * uncertainty (lambda_u = --lu = 0.5), with
AdamW (lr 1e-5), step decay x0.5 every 25 epochs, and frozen BN.

TPU-native: clips are batched and sharded over the mesh 'data' axis (the
reference is strictly batch_size=1 single-GPU); conv kernels are sharded over
'model' (tensor parallelism via GSPMD). The whole step is one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import AFBURR
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS


@dataclasses.dataclass
class VideoTrainConfig:
    lr: float = 1e-5
    weight_decay: float = 0.01
    lambda_u: float = 0.5          # --lu, train_video_seg.py:30-31
    scheduler_step_epochs: int = 25
    scheduler_gamma: float = 0.5
    clip_n: int = 6
    max_obj_n: int = 3
    output_size: int = 400
    epochs: int = 100
    seed: int = 0
    # Rematerialisation: recompute the per-clip forward during the backward
    # pass instead of keeping all T-1 frames' activations live (the standard
    # TPU HBM/FLOPs trade — enables bigger clips / per-chip batches; the
    # reference has no equivalent, it is capped at batch_size=1).
    remat: bool = False
    # Live BatchNorm (batch statistics + EMA running-stat updates). The
    # reference trains with BN frozen because its encoders carry ImageNet
    # stats (train_video_seg.py:106); training FROM SCRATCH needs live BN
    # (see models.resnet.FrozenBN).
    update_bn: bool = False
    # Global-norm gradient clip (0 = off). The decoder emits UNBOUNDED
    # fg log-odds by design (the reference's 1e-7 prob clip is a
    # zero-gradient training trap — see models.afb_urr.Decoder); at
    # from-scratch init those can be huge, so bounded updates are the
    # default.
    grad_clip: float = 1.0


class VideoTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any = struct.field(pytree_node=True)
    opt_state: Any = struct.field(pytree_node=True)


def video_clip_loss(model: AFBURR, params, batch_stats, frames, masks,
                    lambda_u: float, remat: bool = False,
                    update_bn: bool = False):
    """Loss for a batch of clips. Returns (loss, new_batch_stats) — the
    stats pass through unchanged unless ``update_bn`` (live-BN training,
    see VideoTrainConfig.update_bn).

    frames [B, T, H, W, 3]; masks [B, T, obj_n, H, W] one-hot.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    mutable = ["batch_stats"] if update_bn else False

    def per_clip(frames_c, masks_c):
        out1 = model.apply(variables, frames_c[0], masks_c[0],
                           method=model.memorize, mutable=mutable)
        (k4, v4), upd1 = out1 if update_bn else (out1, None)
        valid = jnp.ones(k4.shape[:2], bool)
        out2 = model.apply(variables, frames_c[1:], k4, v4, valid,
                           True, method=model.segment, mutable=mutable)
        (score, unc, _), upd2 = out2 if update_bn else (out2, None)
        # score [T-1, obj, H, W] logits; labels from one-hot masks.
        labels = jnp.argmax(masks_c[1:], axis=1)           # [T-1, H, W]
        logits = jnp.moveaxis(score, 1, -1)                # [T-1, H, W, obj]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss = ce.mean() + lambda_u * unc
        if not update_bn:
            return loss, batch_stats
        # both applies ran from the same incoming stats (parallel-branch
        # BN approximation); average their EMA updates
        new_stats = jax.tree.map(lambda a, b: 0.5 * (a + b),
                                 upd1["batch_stats"], upd2["batch_stats"])
        return loss, new_stats

    if remat:
        per_clip = jax.checkpoint(per_clip)
    losses, stats = jax.vmap(per_clip)(frames, masks)
    new_stats = jax.tree.map(lambda s: s.mean(axis=0), stats) \
        if update_bn else batch_stats
    return losses.mean(), new_stats


def make_lr_schedule(cfg: VideoTrainConfig, steps_per_epoch: int):
    """StepLR(step=25 epochs, gamma=0.5) equivalent."""
    boundaries = {}
    n_drops = max(cfg.epochs // cfg.scheduler_step_epochs, 1)
    for i in range(1, n_drops + 1):
        boundaries[i * cfg.scheduler_step_epochs * steps_per_epoch] = \
            cfg.scheduler_gamma
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def init_video_train_state(model: AFBURR, variables, cfg: VideoTrainConfig,
                           steps_per_epoch: int = 1000
                           ) -> Tuple[VideoTrainState, optax.GradientTransformation]:
    tx = optax.adamw(make_lr_schedule(cfg, steps_per_epoch),
                     weight_decay=cfg.weight_decay)
    if getattr(cfg, "grad_clip", 0.0):
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    params = variables["params"]
    return VideoTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
    ), tx


def param_sharding_rules(mesh: Mesh):
    """Tensor-parallel layout: conv output channels over 'model' when they
    divide evenly; everything else replicated. GSPMD inserts the
    collectives."""
    tp = mesh.shape[MODEL_AXIS]

    def rule(x):
        if x.ndim == 4 and x.shape[-1] % tp == 0:
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())
    return rule


def make_video_train_step(model: AFBURR, tx: optax.GradientTransformation,
                          cfg: VideoTrainConfig,
                          mesh: Optional[Mesh] = None) -> Callable:
    """Build the jitted train step. With a mesh, clips are DP-sharded over
    'data' and conv kernels TP-sharded over 'model'."""

    update_bn = getattr(cfg, "update_bn", False)

    def step(state: VideoTrainState, frames, masks):
        def loss_fn(params):
            return video_clip_loss(model, params, state.batch_stats, frames,
                                   masks, cfg.lambda_u, remat=cfg.remat,
                                   update_bn=update_bn)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats,
                             opt_state=opt_state), loss

    if mesh is None:
        return jax.jit(step, donate_argnums=0)

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, donate_argnums=0,
                   in_shardings=(None, batch_sharding, batch_sharding))


def shard_train_state(state: VideoTrainState, mesh: Mesh) -> VideoTrainState:
    """Place params with TP sharding and optimizer state alongside."""
    rule = param_sharding_rules(mesh)
    place = lambda tree: jax.tree.map(
        lambda x: jax.device_put(x, rule(x)), tree)
    return state.replace(
        params=place(state.params),
        batch_stats=place(state.batch_stats),
        opt_state=place(state.opt_state),
    )
