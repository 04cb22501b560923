"""End-to-end pipeline smoke tests (CPU, random weights, tiny frames)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR, LinkNet
from vfloodnet_tpu.pipelines.video_seg import (VideoSegEngine,
                                               run_video_segmentation,
                                               to_onehot)
from vfloodnet_tpu.utils import COLOR_PALETTE, load_mask, save_seg_mask


def _write_clip(tmp_path, n=4, h=48, w=64):
    rng = np.random.RandomState(0)
    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    base = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    for i in range(n):
        img = np.roll(base, i * 2, axis=1)
        Image.fromarray(img).save(frame_dir / f"{i:05d}.jpg")
    return str(frame_dir)


def test_pack_bits_roundtrip():
    from vfloodnet_tpu.pipelines.video_seg import pack_bits, unpack_bits
    rng = np.random.RandomState(1)
    for w in (64, 61, 8, 3):                     # incl. non-multiple-of-8
        label = (rng.rand(13, w) > 0.5).astype(np.uint8)
        packed = np.asarray(jax.jit(pack_bits)(jnp.asarray(label)))
        np.testing.assert_array_equal(packed,
                                      np.packbits(label, axis=1))
        np.testing.assert_array_equal(unpack_bits(packed, w), label)


def test_resolve_postprocess():
    from vfloodnet_tpu.pipelines.video_seg import resolve_postprocess
    assert resolve_postprocess(True) == "device"
    assert resolve_postprocess(False) == "none"
    assert resolve_postprocess("host") == "host"
    # tests run on the CPU platform -> auto resolves to host
    assert resolve_postprocess("auto") == "host"


def test_host_largest_cc_matches_device_op():
    from vfloodnet_tpu import ops
    from vfloodnet_tpu.pipelines.video_seg import host_largest_cc
    rng = np.random.RandomState(2)
    for _ in range(5):
        mask = (rng.rand(24, 31) > 0.55).astype(np.uint8)
        host = host_largest_cc(mask)
        dev = np.asarray(ops.largest_connected_component(jnp.asarray(mask)))
        # identical component sizes; ties may pick a different component
        assert host.sum() == dev.sum()


def test_to_onehot():
    mask = np.zeros((4, 4), np.uint8)
    mask[1:3, 1:3] = 1
    oh = to_onehot(mask, 2)
    assert oh.shape == (2, 4, 4)
    np.testing.assert_array_equal(oh[1], mask.astype(np.float32))
    np.testing.assert_array_equal(oh[0] + oh[1], np.ones((4, 4), np.float32))


def test_video_seg_engine_smoke(tmp_path):
    model = AFBURR(read_chunk=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=2048)
    engine = VideoSegEngine(model, variables, fb, downsample=48,
                            postprocess=False)

    rng = np.random.RandomState(1)
    frame0 = rng.rand(48, 64, 3).astype(np.float32)
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[20:40, 20:50] = 1
    state = engine.bootstrap(frame0, mask0)
    assert int(state.count()[0]) == 3 * 4

    for i in range(3):
        frame = rng.rand(48, 64, 3).astype(np.float32)
        state, label = engine.step(state, frame, i + 1)
    label_np = engine.fetch_label(label)
    assert label_np.shape == (48, 64)
    assert label_np.dtype == np.uint8
    assert set(np.unique(label_np)) <= {0, 1}
    # bank grew beyond the first frame
    assert int(state.count()[0]) > 12


def test_video_seg_engine_memorize_every():
    """memorize_every=2: the bank only grows on memorize frames; skipped
    frames still segment and record usage."""
    model = AFBURR(read_chunk=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=2048)
    engine = VideoSegEngine(model, variables, fb, downsample=48,
                            postprocess=False, memorize_every=2)
    assert engine._step_ro is not engine._step

    rng = np.random.RandomState(1)
    frame0 = rng.rand(48, 64, 3).astype(np.float32)
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[20:40, 20:50] = 1
    state = engine.bootstrap(frame0, mask0)
    n0 = int(state.count()[0])

    # frame 1: odd -> read-only step, bank unchanged
    state, label = engine.step(state, rng.rand(48, 64, 3).astype(np.float32), 1)
    assert int(state.count()[0]) == n0
    assert float(np.asarray(state.usage).sum()) > 0      # usage recorded
    # frame 2: even -> full step, bank grows
    state, label = engine.step(state, rng.rand(48, 64, 3).astype(np.float32), 2)
    assert int(state.count()[0]) > n0
    label_np = engine.fetch_label(label)
    assert set(np.unique(label_np)) <= {0, 1}


def test_run_video_segmentation_cli_flow(tmp_path):
    frame_dir = _write_clip(tmp_path)
    model = AFBURR(read_chunk=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)

    # Pre-write the first-frame mask (bootstrap contract).
    out_dir = str(tmp_path / "output")
    mask_dir = os.path.join(out_dir, "clip", "mask")
    os.makedirs(mask_dir)
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[24:, :] = 1
    save_seg_mask(mask0, os.path.join(mask_dir, "00000.png"))

    res = run_video_segmentation(frame_dir, "clip", out_dir,
                                 model=model, variables=variables,
                                 budget=2048, downsample=48,
                                 viz=True, postprocess=False)
    masks = sorted(os.listdir(mask_dir))
    assert masks == [f"{i:05d}.png" for i in range(4)]
    m = load_mask(os.path.join(mask_dir, "00003.png"))
    assert m.shape == (48, 64)
    overlays = sorted(os.listdir(os.path.join(out_dir, "clip", "overlay")))
    assert len(overlays) == 4
    assert res["frames"] == 3


def test_linknet_forward_shapes():
    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 1)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


def test_video_segmentation_resume_from_bank_checkpoint(tmp_path):
    frame_dir = _write_clip(tmp_path, n=5)
    model = AFBURR(read_chunk=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    out_dir = str(tmp_path / "output")
    mask_dir = os.path.join(out_dir, "clip", "mask")
    os.makedirs(mask_dir)
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[24:, :] = 1
    save_seg_mask(mask0, os.path.join(mask_dir, "00000.png"))

    kwargs = dict(model=model, variables=variables, budget=2048,
                  downsample=48, viz=False, postprocess="none",
                  checkpoint_every=3)
    run_video_segmentation(frame_dir, "clip", out_dir, **kwargs)
    assert os.path.isdir(os.path.join(out_dir, "clip", "bank_ckpt"))
    masks_first = {f: os.path.getmtime(os.path.join(mask_dir, f))
                   for f in os.listdir(mask_dir)}
    assert len(masks_first) == 5

    # second run resumes from the checkpoint (frames before the resume point
    # are skipped) and completes the tail again
    res = run_video_segmentation(frame_dir, "clip", out_dir, **kwargs)
    assert res["frames"] == 1   # only the post-checkpoint tail reruns
    assert len(os.listdir(mask_dir)) == 5
