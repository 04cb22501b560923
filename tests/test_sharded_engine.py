"""Multi-chip video engine vs the single-device engine (8-dev CPU mesh).

The sharded engine runs the WHOLE per-frame transition as one jitted graph
with shard_map read/update sections inside; labels must match the
single-device engine and the bank telemetry (occupancy / peak / replaced)
must track the same counts (reference FeatureBank.print_peak_mem,
FeatureBank.py:145-149).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.parallel import make_mesh
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
from vfloodnet_tpu.pipelines.video_seg_sharded import ShardedVideoSegEngine


def test_sharded_engine_matches_single_device():
    model = AFBURR(read_chunk=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=2048)

    rng = np.random.RandomState(0)
    frames = [rng.rand(48, 64, 3).astype(np.float32) for _ in range(4)]
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[24:, :] = 1

    # single-device reference (same full-res label path, no CC)
    ref = VideoSegEngine(model, variables, fb, downsample=48,
                         postprocess="none")
    rstate = ref.bootstrap(frames[0], mask0)

    mesh = make_mesh((1, 8))
    sharded = ShardedVideoSegEngine(model, variables, fb, mesh,
                                    downsample=48, postprocess="none")
    sstate = sharded.bootstrap(frames[0], mask0)
    assert int(jnp.sum(sstate.valid)) == int(jnp.sum(rstate.valid))

    for i, f in enumerate(frames[1:]):
        rstate, rlab = ref.step(rstate, f, i + 1)
        sstate, slab = sharded.step(sstate, f, i + 1)
        agreement = (sharded.fetch_label(slab) == ref.fetch_label(rlab)).mean()
        assert agreement > 0.99, (i, agreement)

    # live-slot counts evolve identically, telemetry is maintained
    assert int(jnp.sum(sstate.valid)) == int(jnp.sum(rstate.valid))
    np.testing.assert_array_equal(np.asarray(sstate.occ),
                                  np.asarray(jnp.sum(sstate.valid, axis=1)))
    assert np.all(np.asarray(sstate.peak_n) >= np.asarray(sstate.occ))
    # below budget: no eviction
    np.testing.assert_array_equal(np.asarray(sstate.replace_n), [0, 0])
    # usage bookkeeping ran (read counts accumulated into valid slots)
    assert float(jnp.sum(sstate.usage)) > 0.0


def test_sharded_streaming_loop(tmp_path):
    """End-to-end streaming CLI loop on the 8-dev mesh writes the standard
    output tree."""
    import os

    from PIL import Image

    from vfloodnet_tpu.pipelines.video_seg_sharded import \
        run_video_segmentation_sharded
    from vfloodnet_tpu.utils import save_seg_mask

    rng = np.random.RandomState(1)
    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    for i in range(3):
        arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(frame_dir / f"{i:02d}.jpg")

    mask0 = np.zeros((48, 64), np.uint8)
    mask0[24:, :] = 1
    mask_dir = tmp_path / "out" / "vid" / "mask"
    os.makedirs(mask_dir)
    save_seg_mask(mask0, str(mask_dir / "00.png"))

    model = AFBURR(read_chunk=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    mesh = make_mesh((1, 8))
    res = run_video_segmentation_sharded(
        str(frame_dir), "vid", mesh, out_dir=str(tmp_path / "out"),
        model=model, variables=variables, budget=2048, downsample=48,
        viz=True, postprocess="none")
    assert res["frames"] == 2
    for i in range(3):
        assert os.path.exists(mask_dir / f"{i:02d}.png")
        assert os.path.exists(tmp_path / "out" / "vid" / "overlay"
                              / f"{i:02d}.png")
