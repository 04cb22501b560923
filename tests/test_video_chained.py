"""Chained multi-frame step (``VideoSegEngine.step_n``): one dispatch for K
frames via ``lax.scan`` must match K single-frame dispatches exactly.

The scan body IS the single-step graph, so labels must be bitwise identical
and the final bank state must agree; this pins the dispatch-amortisation
path (used by bench.py / high-throughput batch drivers) to the per-frame
reference semantics (reference loop: test_video_seg.py:96-131).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine


def _make_engine(postprocess):
    model = AFBURR(read_chunk=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=2048)
    return VideoSegEngine(model, variables, fb, downsample=48,
                          postprocess=postprocess)


@pytest.mark.parametrize("postprocess", [False, "device"])
def test_step_n_matches_single_steps(postprocess):
    engine = _make_engine(postprocess)
    rng = np.random.RandomState(3)
    frame0 = rng.rand(48, 64, 3).astype(np.float32)
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[18:40, 16:52] = 1
    frames = [rng.rand(48, 64, 3).astype(np.float32) for _ in range(4)]

    # Reference: four single-frame dispatches.
    state_a = engine.bootstrap(frame0, mask0)
    labels_a = []
    for i, f in enumerate(frames):
        state_a, label = engine.step(state_a, f, i + 1)
        labels_a.append(engine.fetch_label(label))

    # Chained: one dispatch for the same four frames.
    state_b = engine.bootstrap(frame0, mask0)
    state_b, labels = engine.step_n(state_b, frames, 1)
    labels_b = engine.fetch_labels(labels)

    assert labels_b.shape == (4,) + labels_a[0].shape
    for i in range(4):
        np.testing.assert_array_equal(labels_b[i], labels_a[i])

    # Bank state agrees: occupancy exactly, features numerically.
    np.testing.assert_array_equal(np.asarray(state_a.occ),
                                  np.asarray(state_b.occ))
    np.testing.assert_array_equal(np.asarray(state_a.valid),
                                  np.asarray(state_b.valid))
    np.testing.assert_allclose(np.asarray(state_a.keys, np.float32),
                               np.asarray(state_b.keys, np.float32),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_a.usage),
                               np.asarray(state_b.usage),
                               rtol=1e-5, atol=1e-5)


def test_step_n_rejects_memorize_every():
    model = AFBURR(read_chunk=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=2048)
    engine = VideoSegEngine(model, variables, fb, downsample=48,
                            postprocess=False, memorize_every=2)
    with pytest.raises(ValueError):
        engine.step_n(None, np.zeros((2, 48, 64, 3), np.uint8), 1)
