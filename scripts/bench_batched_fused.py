"""Fused-step scaling: the batched engine's ONE-dispatch step at B=1,2,4,8.

Times BatchVideoSegEngine._step (whole per-frame transition, one jit) as a
function of stream count, per-frame-synced. If per-frame time falls below
the single-stream engine's fused step as B grows, batching genuinely
raises utilisation (shared weight reads across streams); if it scales
linearly, the chip is already activation-bandwidth-bound at B=1 and the
batched engine cannot beat the free-running single stream (VERDICT
round-1 next #3 — measurement first).

Run on the real TPU: python scripts/bench_batched_fused.py [Bs...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vfloodnet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.pipelines.loaders import cast_floating_params
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
from vfloodnet_tpu.pipelines.video_seg_batch import BatchVideoSegEngine

RES = (1080, 1920)
OPERATING = 480
BUDGET = 250_000
REPS = int(os.environ.get("VFLOOD_BENCH_REPEATS", "5"))
STEPS = 16  # frames per timed chain (amortizes the forced-fetch floor)
# 'auto' | 'none' | 'device' — 'none' isolates the seg+bank transition from
# the largest-CC stage when diagnosing batched-vs-single scaling.
POSTPROCESS = os.environ.get("VFLOOD_BENCH_POSTPROCESS", "auto")


def time_steps(step_fn, state, frames_dev, fidx0):
    """Per-step device time: STEPS state-chained steps forced by ONE
    scalar fetch of the final label, minus the calibrated D2H floor.
    ``block_until_ready`` is a dispatch fence only on the axon relay
    (scripts/_bench_timing.py) — the old version of this function timed
    dispatch+H2D, which is what produced the bogus day-6 "anomaly"."""
    from _bench_timing import fetch_floor, force

    best = float("inf")
    st = jax.tree.map(jnp.copy, state)       # step donates its state
    st, lab = step_fn(st, frames_dev[0], jnp.float32(fidx0))
    force(lab)                               # warm: compile + real exec
    floor = fetch_floor(lab)
    for _ in range(REPS):
        st = jax.tree.map(jnp.copy, state)   # same early-bank regime per rep
        for leaf in jax.tree_util.tree_leaves(st):
            force(leaf)  # materialize every copy OUTSIDE the timed chain
        t0 = time.time()
        for i in range(STEPS):
            st, lab = step_fn(st, frames_dev[i % len(frames_dev)],
                              jnp.float32(fidx0 + 1 + i))
        force(lab)                           # executes the whole chain
        best = min(best, (time.time() - t0 - floor) / STEPS)
    return best * 1000.0


def main():
    bs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    if os.environ.get("VFLOOD_BENCH_RANDOM_INIT"):
        # Random init produces speckle masks whose device-CC fixpoint cost is
        # far above the blob-mask production regime — keep as an opt-in
        # worst-case mode.
        model = AFBURR(dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                               jnp.zeros((2, 48, 64)), method=model.init_all)
        variables = cast_floating_params(variables, jnp.bfloat16)
        weights = "random-init"
    else:
        # Bundled trained demo checkpoint when present (same policy as
        # bench.py) — representative blob masks, representative CC cost.
        # load_afb_urr falls back to random init with a warning when the
        # checkpoint is absent; report which regime actually ran so
        # checkpoint-less results aren't mistaken for production numbers
        # (advisor round-2 item).
        from vfloodnet_tpu.pipelines.loaders import default_checkpoint, \
            load_afb_urr
        model, variables = load_afb_urr(None, dtype=jnp.bfloat16)
        weights = ("trained-demo" if default_checkpoint("video")
                   else "random-init (no bundled checkpoint!)")
    print(f"weights: {weights}  postprocess: {POSTPROCESS}")

    rng = np.random.RandomState(0)
    # bundled real frames -> production blob masks -> representative
    # largest-CC fixpoint trip counts (noise frames cost ~15 sweeps vs
    # 2-7 for blobs; docs/ROADMAP.md day-7)
    from bench import _bench_frames
    base = _bench_frames(RES, rng, n=8)
    mask0 = np.zeros(RES, np.uint8)
    mask0[RES[0] // 2:, :] = 1

    # single-stream fused step (the reference point)
    fb1 = FeatureBank(obj_n=2, memory_budget=BUDGET, dtype=jnp.bfloat16)
    eng1 = VideoSegEngine(model, variables, fb1, downsample=OPERATING,
                          postprocess=POSTPROCESS)
    st1 = eng1.bootstrap(base[0].astype(np.float32) / 255.0, mask0)
    f1 = [jax.device_put(f) for f in base[1:3]]

    def step1(st, f, idx):
        st, lab, _ = eng1._step(st, f, idx)
        return st, lab

    ms1 = time_steps(step1, st1, f1, 5)
    print(f"single-stream fused step: {ms1:.2f} ms/frame "
          f"({1000.0 / ms1:.1f} fps device-bound)")

    for B in bs:
        fb = FeatureBank(obj_n=2, memory_budget=BUDGET, dtype=jnp.bfloat16)
        eng = BatchVideoSegEngine(model, variables, fb, batch=B,
                                  downsample=OPERATING,
                                  postprocess=POSTPROCESS)
        state = eng.bootstrap([base[s % len(base)].astype(np.float32) / 255.0
                               for s in range(B)], [mask0] * B)
        frames = [jax.device_put(np.stack(
            [base[(t + 1 + s) % len(base)] for s in range(B)]))
            for t in range(2)]
        ms = time_steps(eng._step, state, frames, 5)
        print(f"B={B}: {ms:.2f} ms/step = {ms / B:.2f} ms/frame "
              f"-> {1000.0 * B / ms:.1f} fps aggregate "
              f"(x{ms1 / (ms / B):.2f} vs single fused)")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
