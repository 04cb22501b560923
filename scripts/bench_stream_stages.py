#!/usr/bin/env python
"""Microbench: isolate the host-side stages of the streaming video loop.

bench.py's free-running throughput stage interleaves device steps with an
async label readback and a writer pool (fetch + unpack + palette-PNG write).
This script times the same 20-frame loop at four accumulation levels so a
throughput regression can be attributed to a specific stage:

  steps      device steps only (block at end)
  +async     + copy_to_host_async per frame
  +fetch     + writer pool fetching each label (D2H through the tunnel)
  +write     + unpack_bits + palette PNG write (the full bench.py loop)

Run standalone (one TPU process at a time — see CLAUDE.md).
"""

import functools
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

N_FRAMES = 20


def run_loop(engine, state0, frames, mode: str, tmpdir: str) -> float:
    """Return fps for one accumulation level. State is NOT reused across
    calls (donation consumes it): caller passes a fresh bootstrap."""
    from vfloodnet_tpu.pipelines.video_seg import host_largest_cc
    from vfloodnet_tpu.utils import save_seg_mask

    state = state0
    writer = ThreadPoolExecutor(max_workers=2)

    def _write(i, label):
        pred = engine.fetch_label(label)
        if mode == "+write":
            if engine.postprocess == "host":
                pred = host_largest_cc(pred)
            save_seg_mask(pred, f"{tmpdir}/{mode}_{i:05d}.png")

    writes, pending = [], None
    t0 = time.time()
    for i in range(N_FRAMES):
        state, label = engine.step(state, frames[i % len(frames)], i + 4)
        if mode != "steps":
            label.copy_to_host_async()
        if mode in ("+fetch", "+write"):
            if pending is not None:
                writes.append(writer.submit(_write, *pending))
            pending = (i, label)
    if pending is not None:
        _write(*pending)
    for w in writes:
        w.result()
    if mode in ("steps", "+async"):
        # no per-frame fetch happened: force the chain (block_until_ready
        # is a dispatch fence only on the relay, _bench_timing.py)
        from _bench_timing import force
        force(label)
    total = time.time() - t0
    writer.shutdown()
    return N_FRAMES / total


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.models import AFBURR
    from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)

    model = AFBURR(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=250_000, dtype=jnp.bfloat16)
    engine = VideoSegEngine(model, variables, fb, downsample=480,
                            postprocess="auto")
    res_hw = (1080, 1920)
    rng = np.random.RandomState(0)
    frame0 = rng.rand(*res_hw, 3).astype(np.float32)
    mask0 = np.zeros(res_hw, np.uint8)
    mask0[res_hw[0] // 2:, :] = 1
    frames = [engine.upload((rng.rand(*res_hw, 3) * 255).astype(np.uint8))
              for _ in range(4)]

    # compile once
    from _bench_timing import force
    state = engine.bootstrap(frame0, mask0)
    for i in range(3):
        state, label = engine.step(state, frames[i % 4], i + 1)
    force(label)

    tmpdir = tempfile.mkdtemp(prefix="bench_stream_")
    for mode in ("steps", "+async", "+fetch", "+write"):
        st = engine.bootstrap(frame0, mask0)
        for i in range(3):
            st, lab = engine.step(st, frames[i % 4], i + 1)
        force(lab)    # drain warmup before the timed loop
        fps = run_loop(engine, st, frames, mode, tmpdir)
        print(f"  {mode:7s} {fps:7.2f} fps  ({1000.0 / fps:6.1f} ms/frame)")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
