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


class VideoTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any = struct.field(pytree_node=True)
    opt_state: Any = struct.field(pytree_node=True)


def video_clip_loss(model: AFBURR, params, batch_stats, frames, masks,
                    lambda_u: float, remat: bool = False):
    """Loss for a batch of clips.

    frames [B, T, H, W, 3]; masks [B, T, obj_n, H, W] one-hot.
    """
    variables = {"params": params, "batch_stats": batch_stats}

    def per_clip(frames_c, masks_c):
        k4, v4 = model.apply(variables, frames_c[0], masks_c[0],
                             method=model.memorize)       # [obj, P, d]
        valid = jnp.ones(k4.shape[:2], bool)
        score, unc, _ = model.apply(variables, frames_c[1:], k4, v4, valid,
                                    True, method=model.segment)
        # score [T-1, obj, H, W] logits; labels from one-hot masks.
        labels = jnp.argmax(masks_c[1:], axis=1)           # [T-1, H, W]
        logits = jnp.moveaxis(score, 1, -1)                # [T-1, H, W, obj]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return ce.mean() + lambda_u * unc

    if remat:
        per_clip = jax.checkpoint(per_clip)
    losses = jax.vmap(per_clip)(frames, masks)
    return losses.mean()


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

    def step(state: VideoTrainState, frames, masks):
        def loss_fn(params):
            return video_clip_loss(model, params, state.batch_stats, frames,
                                   masks, cfg.lambda_u, remat=cfg.remat)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
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
