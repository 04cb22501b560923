"""Body-mesh regressor trainer (people-depth chain, model-in-the-loop).

The reference regresses SMPL vertices with released METRO weights via a
subprocess (estimation/object_detection.py:319-325,
scripts/inference_bodymesh.py:52-112); those weights cannot be downloaded
here, so the people chain trains a :class:`BodyMeshRegressor` on synthetic
standing-person crops (data/detection_dataset.py::render_person_scene):
the target is the canonical standing template scaled to the TRUE body
extent inside the crop — including the part hidden under water, which is
exactly the extrapolation the depth geometry needs (the mesh must span the
submerged legs so the above/below-water vertex split yields the submerge
ratio, reference :337-387).
"""

from __future__ import annotations

import dataclasses

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.metro import BodyMeshRegressor, project_orthographic


@dataclasses.dataclass
class BodyMeshTrainConfig:
    lr: float = 3e-4
    weight_decay: float = 1e-4
    crop_size: int = 224
    seed: int = 0
    # cosine decay horizon; 0 = constant lr. A flat 3e-4 with live BN was
    # measured to thrash late in training (loss 0.07 -> 1.8 spikes near
    # step 1200 produced a diverged final checkpoint, round-4 log).
    total_steps: int = 0


class BodyMeshTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_bodymesh_train_state(model: BodyMeshRegressor, variables,
                              cfg: BodyMeshTrainConfig
                              ) -> Tuple[BodyMeshTrainState,
                                         optax.GradientTransformation]:
    lr = (optax.cosine_decay_schedule(cfg.lr, cfg.total_steps, 0.02)
          if cfg.total_steps else cfg.lr)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(lr, weight_decay=cfg.weight_decay))
    params = variables["params"]
    return BodyMeshTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    ), tx


def make_bodymesh_train_step(model: BodyMeshRegressor,
                             tx: optax.GradientTransformation
                             ) -> Callable:
    """One crop per step (the module is single-crop), live BN — the
    backbone trains from scratch (no pretrained stats; see FrozenBN)."""

    def step(state: BodyMeshTrainState, crop01, target_2d):
        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            (verts, _joints, cam), upd = model.apply(
                variables, crop01, mutable=["batch_stats"])
            pred_2d = project_orthographic(verts, cam)
            loss = jnp.mean((pred_2d - target_2d) ** 2)
            return loss, upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats,
                             opt_state=opt_state), loss

    return jax.jit(step, donate_argnums=0)


def make_training_sample(rng: np.random.Generator, template_2d: np.ndarray,
                         size: int = 320, crop_size: int = 224
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(crop01 [224,224,3] RGB, target_2d [V,2] in [-1,1] crop coords).

    Renders a person scene (water band over the legs half the time), crops
    with the inference-path geometry (crop_person with a jittered detector
    box), and maps the template to the TRUE head..feet extent in crop
    coordinates."""
    from ..data.detection_dataset import render_person_scene
    from ..pipelines.object_detection import crop_person

    water = float(rng.uniform(0.1, 0.5)) if rng.random() < 0.5 else None
    sc = render_person_scene(rng, size, water_level=water)
    box = sc["boxes"][0].copy()
    # detector boxes are imperfect; a submerged person's box also stops at
    # the waterline — emulate both
    if water is not None and rng.random() < 0.7:
        wy = size * (1.0 - water)
        box[3] = min(box[3], wy)
    box += rng.normal(0.0, 2.0, 4).astype(np.float32)

    img_bgr = sc["image"]
    crop, _ = crop_person(img_bgr, sc["water_mask"], box)

    # crop window (same arithmetic as crop_person)
    x1, y1, x2, y2 = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    radius = min(size, 1.5 * max(x2 - x1, y2 - y1)) / 2
    left, top = cx - radius, cy - radius
    if left < 0:
        left = 0
    if left + 2 * radius > size:
        left = size - 2 * radius
    if top < 0:
        top = 0
    if top + 2 * radius > size:
        top = size - 2 * radius
    span = 2 * radius

    def to_crop(y):
        return float(np.clip(2.0 * (y - top) / span - 1.0, -1.5, 1.5))

    head_c, feet_c = to_crop(sc["head_y"]), to_crop(sc["feet_y"])
    gt_cx = (sc["boxes"][0, 0] + sc["boxes"][0, 2]) / 2
    gt_w = sc["boxes"][0, 2] - sc["boxes"][0, 0]
    cx_c = float(2.0 * (gt_cx - left) / span - 1.0)
    w_c = float(gt_w / span)

    # template y spans [-0.95, 0.95] -> [head_c, feet_c]; x scaled to the
    # person's half-width and centred on the body
    t = template_2d
    ty = (t[:, 1] + 0.95) / 1.9 * (feet_c - head_c) + head_c
    tx = t[:, 0] / np.abs(t[:, 0]).max() * (w_c / 2.0) + cx_c
    target = np.stack([tx, ty], axis=1).astype(np.float32)

    crop01 = crop[..., ::-1].astype(np.float32) / 255.0   # BGR -> RGB
    return np.ascontiguousarray(crop01), target
