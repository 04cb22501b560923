"""Golden regression: fixed-seed propagation must stay stable across
refactors (guards the step graph: resize, encoders, read, decode, bank
update, packing). Regenerate tests/golden/video_seg_golden.npz only for
intentional behaviour changes."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "video_seg_golden.npz")


def test_video_propagation_matches_golden():
    model = AFBURR(read_chunk=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=1024)
    eng = VideoSegEngine(model, variables, fb, downsample=48,
                         postprocess="none")
    rng = np.random.RandomState(123)
    frames = [rng.rand(48, 64, 3).astype(np.float32) for _ in range(4)]
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[24:, :] = 1
    state = eng.bootstrap(frames[0], mask0)
    labels = []
    for i, f in enumerate(frames[1:]):
        state, lab = eng.step(state, f, i + 1)
        labels.append(eng.fetch_label(lab))
    got = np.stack(labels)
    want = np.load(GOLDEN)["labels"]
    agreement = (got == want).mean()
    assert agreement > 0.999, agreement
