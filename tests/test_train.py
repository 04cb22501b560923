"""Trainer tests: loss goes down, steps jit, DP/TP sharding compiles on the
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.models import AFBURR, LinkNet
from vfloodnet_tpu.parallel import make_mesh
from vfloodnet_tpu.train import (ImageTrainConfig, VideoTrainConfig,
                                 dice_loss, init_image_train_state,
                                 init_video_train_state, iou_metric,
                                 make_image_train_step, make_video_train_step)
from vfloodnet_tpu.train.train_video import shard_train_state


def _video_batch(rng, b, t, h, w):
    frames = jnp.asarray(rng.rand(b, t, h, w, 3).astype(np.float32))
    fg = (rng.rand(b, t, 1, h, w) > 0.5).astype(np.float32)
    masks = jnp.asarray(np.concatenate([1.0 - fg, fg], axis=2))
    return frames, masks


def test_video_train_step_runs_and_loss_finite():
    model = AFBURR(read_chunk=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((32, 32, 3)),
                           jnp.zeros((2, 32, 32)), method=model.init_all)
    cfg = VideoTrainConfig(clip_n=3, max_obj_n=2)
    state, tx = init_video_train_state(model, variables, cfg, 10)
    step = make_video_train_step(model, tx, cfg)
    rng = np.random.RandomState(0)
    frames, masks = _video_batch(rng, 1, 3, 32, 32)
    state, loss1 = step(state, frames, masks)
    losses = [float(loss1)]
    for _ in range(7):
        state, loss = step(state, frames, masks)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    # same batch repeatedly: the optimiser must make net progress (single
    # steps can rise — the unbounded log-odds head makes early steps
    # noisy at random init)
    assert min(losses[1:]) < losses[0] + 1e-3, losses


def test_video_train_remat_matches_plain():
    """remat=True recomputes the forward in the backward pass — the loss and
    resulting params must match the non-remat step exactly."""
    model = AFBURR(read_chunk=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((32, 32, 3)),
                           jnp.zeros((2, 32, 32)), method=model.init_all)
    rng = np.random.RandomState(0)
    frames, masks = _video_batch(rng, 1, 3, 32, 32)

    results = []
    for remat in (False, True):
        cfg = VideoTrainConfig(clip_n=3, max_obj_n=2, remat=remat)
        # The jitted step donates its state; give each run a fresh copy.
        state, tx = init_video_train_state(
            model, jax.tree.map(jnp.copy, variables), cfg, 10)
        step = make_video_train_step(model, tx, cfg)
        state, loss = step(state, frames, masks)
        results.append((float(loss), state.params))
    (l0, p0), (l1, p1) = results
    assert np.isclose(l0, l1, rtol=1e-6)
    leaves0 = jax.tree.leaves(p0)
    leaves1 = jax.tree.leaves(p1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=3e-5)


def test_video_train_step_sharded_mesh():
    mesh = make_mesh((4, 2))
    model = AFBURR(read_chunk=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((32, 32, 3)),
                           jnp.zeros((2, 32, 32)), method=model.init_all)
    cfg = VideoTrainConfig(clip_n=3, max_obj_n=2)
    state, tx = init_video_train_state(model, variables, cfg, 10)
    state = shard_train_state(state, mesh)
    step = make_video_train_step(model, tx, cfg, mesh=mesh)
    rng = np.random.RandomState(1)
    frames, masks = _video_batch(rng, 4, 3, 32, 32)
    state, loss = step(state, frames, masks)
    assert jnp.isfinite(loss)


def test_image_train_step_loss_decreases():
    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cfg = ImageTrainConfig()
    state, tx = init_image_train_state(model, variables, cfg, 10)
    step = make_image_train_step(model, tx)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(2, 64, 64) > 0.5).astype(np.float32))
    losses = []
    for _ in range(3):
        state, loss, iou = step(state, images, masks)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert 0.0 <= float(iou) <= 1.0


def test_dice_and_iou_perfect_prediction():
    pred = jnp.asarray(np.array([[[0.9, 0.1], [0.0, 1.0]]], np.float32))
    target = jnp.asarray(np.array([[[1.0, 0.0], [0.0, 1.0]]], np.float32))
    assert float(dice_loss(pred, target)) < 0.15
    assert float(iou_metric(pred, target)) == 1.0


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    score, cnt = jax.block_until_ready(out)
    assert score.shape[0] == 1 and score.shape[1] == 2
    g.dryrun_multichip(8)


def test_video_training_overfits_one_clip():
    """Gradient flow sanity: 25 steps on one clip must cut the loss
    substantially (exercises encoders, attention read, decoder, uncertainty
    term end-to-end)."""
    model = AFBURR(read_chunk=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((32, 32, 3)),
                           jnp.zeros((2, 32, 32)), method=model.init_all)
    # small lr: aggressive rates collapse a random-init model to the
    # object-symmetric local optimum (CE == ln 2)
    cfg = VideoTrainConfig(clip_n=2, max_obj_n=2, lr=3e-5, lambda_u=0.0,
                           weight_decay=0.0)
    state, tx = init_video_train_state(model, variables, cfg, 10)
    step = make_video_train_step(model, tx, cfg)
    rng = np.random.RandomState(5)
    frames = jnp.asarray(rng.rand(1, 2, 32, 32, 3).astype(np.float32))
    fg = np.zeros((1, 2, 1, 32, 32), np.float32)
    fg[:, :, :, 16:, :] = 1.0
    masks = jnp.asarray(np.concatenate([1.0 - fg, fg], axis=2))
    losses = []
    for _ in range(80):
        state, loss = step(state, frames, masks)
        losses.append(float(loss))
    # clearly below both the initial loss and the ln(2) symmetric plateau
    assert losses[-1] < 0.55, (losses[0], losses[-1])
