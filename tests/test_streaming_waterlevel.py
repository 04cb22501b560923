"""Fused seg+waterline streaming pipeline vs ground truth geometry."""

import os
from datetime import datetime, timedelta

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from PIL import Image

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.pipelines.streaming_waterlevel import (
    BoundedResolver, StreamingWaterLevel, run_streaming_waterlevel)
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
from vfloodnet_tpu.utils import save_seg_mask


def test_streaming_step_levels():
    # engine with a hand-seeded bank whose prediction is water below row 30
    model = AFBURR(read_chunk=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=1024)
    engine = VideoSegEngine(model, variables, fb, downsample=48,
                            postprocess="none")
    rng = np.random.RandomState(0)
    frame0 = rng.rand(48, 64, 3).astype(np.float32)
    mask0 = np.zeros((48, 64), np.uint8)
    mask0[30:, :] = 1
    state = engine.bootstrap(frame0, mask0)

    stream = StreamingWaterLevel(engine, [(28, 4, 8, 8)])
    frame = rng.rand(48, 64, 3).astype(np.float32)
    state, levels, label_small = stream.step(state, frame, 1)
    assert len(levels) == 1
    # level is either NaN (no water predicted) or a positive full-res px gap
    if not np.isnan(levels[0]):
        assert levels[0] > 0


def test_bounded_resolver_caps_live_buffers():
    """Long-video regime (ADVICE r4): the runner must hold O(lag) pending
    device buffers, not O(frames), and forward-fill NaN levels like the
    reference's scan loop (reference_tracking.py:197-204)."""
    values = {}

    class FakeStream:
        @staticmethod
        def resolve(pending):
            return values[pending]

    n = 500
    for i in range(n):
        values[i] = [float(i)] if i % 3 else [float("nan")]
    r = BoundedResolver(FakeStream(), tracker_num=1, lag=4)
    for i in range(n):
        r.push(i)
        assert len(r.pending) <= 4
    levels = r.finish()
    assert r.max_live <= 4
    assert len(levels) == n
    assert levels[0] == [0.0]          # NaN at i=0 -> initial prev 0.0
    assert levels[1] == [1.0]
    assert levels[3] == [1.0 * 2]      # i=3 NaN -> carries i=2's level
    assert levels[4] == [4.0]
    # FIFO order preserved across the drain/finish boundary
    assert levels[n - 1] == [float(n - 1) if (n - 1) % 3 else levels[n - 2][0]]


def test_run_streaming_waterlevel(tmp_path):
    rng = np.random.RandomState(1)
    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    t0 = datetime(2021, 5, 1, 12, 0, 0)
    for i in range(4):
        name = (t0 + timedelta(minutes=3 * i)).strftime("%Y-%m-%d-%H-%M-%S")
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(frame_dir / f"{name}.png")

    record = tmp_path / "records" / "LSU_s"
    record.mkdir(parents=True)
    np.savetxt(record / "ref_bbox.txt", np.array([[28.0, 4.0, 8.0, 8.0]]))

    # pre-store the first-frame mask so no image model is needed
    out_dir = tmp_path / "wl"
    seg_dir = out_dir / "segs" / "LSU_s" / "mask"
    seg_dir.mkdir(parents=True)
    first = sorted(os.listdir(frame_dir))[0][:-4]
    m = np.zeros((48, 64), np.uint8)
    m[30:, :] = 1
    save_seg_mask(m, str(seg_dir / f"{first}.png"))

    model = AFBURR(read_chunk=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)

    csv = run_streaming_waterlevel(str(frame_dir), "LSU_s", str(out_dir),
                                   str(tmp_path / "records"),
                                   model, variables, budget=1024,
                                   downsample=48)
    df = pd.read_csv(csv, index_col=0)
    assert len(df) == 3
    assert "est_avg_px" in df.columns
