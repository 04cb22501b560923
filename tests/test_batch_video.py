"""Multi-stream batch video engine: B streams match B single-stream runs.

Parametrized over the compute dtype: the bf16 variant exercises the
production frame-prep and diff-cast paths (pipelines/video_seg_batch.py)
against the bf16 single-stream engine (ADVICE round-1 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
from vfloodnet_tpu.pipelines.video_seg_batch import BatchVideoSegEngine


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16],
                         ids=["f32", "bf16"])
def test_batch_engine_matches_single_stream(dtype):
    model = AFBURR(read_chunk=128, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=1024, dtype=dtype)

    rng = np.random.RandomState(0)
    vids = [
        [rng.rand(48, 64, 3).astype(np.float32) for _ in range(3)]
        for _ in range(2)]
    masks0 = []
    for v in range(2):
        m = np.zeros((48, 64), np.uint8)
        m[20 + 4 * v:, :] = 1
        masks0.append(m)

    # single-stream references
    singles = []
    for v in range(2):
        eng = VideoSegEngine(model, variables, fb, downsample=48,
                             postprocess="none")
        st = eng.bootstrap(vids[v][0], masks0[v])
        labels = []
        for i, frame in enumerate(vids[v][1:]):
            st, lab = eng.step(st, frame, i + 1)
            labels.append(eng.fetch_label(lab))
        singles.append(labels)

    # batched
    beng = BatchVideoSegEngine(model, variables, fb, batch=2, downsample=48)
    st = beng.bootstrap([v[0] for v in vids], masks0)
    assert int(st.valid[0].sum()) == int(st.valid[1].sum())
    batch_labels = []
    for i in range(2):
        frames = np.stack([vids[0][i + 1], vids[1][i + 1]])
        st, labs = beng.step(st, frames, i + 1)
        batch_labels.append(beng.fetch_labels(labs))

    # f32 must stay essentially exact — it carries the batched==single
    # equivalence claim. bf16 random-weight masks are near-tie at every
    # pixel (logits ~0), so label agreement only measures how XLA's fold
    # order happens to round: measured 0.87-0.97 across fold-order changes
    # (weights as jit args vs closure constants, virtual-device counts).
    # The bf16 variant exists to exercise the production dtype plumbing;
    # assert well-above-chance, not equality.
    thres = 0.995 if dtype == jnp.float32 else 0.80
    for v in range(2):
        for i in range(2):
            a = singles[v][i]
            b = batch_labels[i][v]
            agreement = (a == b).mean()
            assert agreement > thres, (v, i, agreement)


def test_batch_engine_memorize_every_skips_bank_updates():
    """memorize_every > 1: skipped frames run the read-only step (bank
    content frozen, usage bookkeeping still live), update frames mutate the
    bank — mirroring VideoSegEngine's knob."""
    model = AFBURR(read_chunk=128, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=1024, dtype=jnp.float32)

    rng = np.random.RandomState(1)
    first = [rng.rand(48, 64, 3).astype(np.float32) for _ in range(2)]
    masks0 = []
    for v in range(2):
        m = np.zeros((48, 64), np.uint8)
        m[20 + 4 * v:, :] = 1
        masks0.append(m)

    beng = BatchVideoSegEngine(model, variables, fb, batch=2, downsample=48,
                               memorize_every=2)
    st = beng.bootstrap(first, masks0)
    keys0 = np.asarray(st.keys)
    valid0 = np.asarray(st.valid)
    occ0 = np.asarray(st.occ)
    usage0 = np.asarray(st.usage)

    frames = np.stack([rng.rand(48, 64, 3).astype(np.float32)
                       for _ in range(2)])
    # frame 1: 1 % 2 != 0 -> read-only step
    st, _ = beng.step(st, frames, 1)
    np.testing.assert_array_equal(np.asarray(st.keys), keys0)
    np.testing.assert_array_equal(np.asarray(st.valid), valid0)
    np.testing.assert_array_equal(np.asarray(st.occ), occ0)
    assert not np.array_equal(np.asarray(st.usage), usage0)  # usage live

    # frame 2: update step mutates the bank (birth stamps written at least).
    # st is donated into the step, so host-copy anything compared after.
    usage1 = np.asarray(st.usage)
    st2, _ = beng.step(st, frames, 2)
    changed = (not np.array_equal(np.asarray(st2.keys), keys0)
               or not np.array_equal(np.asarray(st2.occ), occ0)
               or not np.array_equal(np.asarray(st2.usage), usage1))
    assert changed
