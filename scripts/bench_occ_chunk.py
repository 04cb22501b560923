#!/usr/bin/env python
"""Full-bank read chunk A/B: fused-step time with the bank at capacity under
different occupancy-loop chunk sizes (VFLOOD_OCC_CHUNK, read at trace time).

The occupancy-bounded read (`ops/attention.py::_xla_read_occ`) serializes the
bank axis into ceil(occ/chunk) fori_loop iterations; at 125k slots/class the
default 8192 chunk runs 16 iterations x 2 sweeps. Bigger chunks cut the
serialized trip count (better MXU occupancy per iteration) at the cost of a
bigger minimum read for near-empty banks — this script measures BOTH regimes
per variant so the trade is explicit.

Run on the real TPU: python scripts/bench_occ_chunk.py
Smoke (CPU): VFLOOD_AB_SMOKE=1 python scripts/bench_occ_chunk.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from vfloodnet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

SMOKE = bool(os.environ.get("VFLOOD_AB_SMOKE"))
RES = (180, 320) if SMOKE else (1080, 1920)
OPERATING = 96 if SMOKE else 480
BUDGET = 65_536 if SMOKE else 250_000
REPS = int(os.environ.get("VFLOOD_BENCH_REPEATS", "4"))
STEPS = 2 if SMOKE else 12
CHUNKS = [int(s) for s in
          os.environ.get("VFLOOD_OCC_CHUNKS", "8192,16384,32768").split(",")]
if SMOKE:
    CHUNKS = [4096, 8192]


def main():
    from _bench_timing import fetch_floor, force

    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.pipelines.loaders import default_checkpoint, \
        load_afb_urr
    from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
    from bench import _bench_frames

    model, variables = load_afb_urr(None, dtype=jnp.bfloat16)
    print("weights:", "trained-demo" if default_checkpoint("video")
          else "random-init", flush=True)

    rng = np.random.RandomState(0)
    base = _bench_frames(RES, rng, n=3)
    frame0 = base[0].astype(np.float32) / 255.0
    mask0 = np.zeros(RES, np.uint8)
    mask0[RES[0] // 2:, :] = 1

    def full_state(eng, st):
        """Bank filled to capacity (the long-video regime)."""
        cap = st.keys.shape[1]
        kk = jax.random.split(jax.random.PRNGKey(2))
        return st.replace(
            keys=jax.random.normal(kk[0], st.keys.shape, st.keys.dtype),
            values=jax.random.normal(kk[1], st.values.shape, st.values.dtype),
            valid=jnp.ones_like(st.valid),
            birth=jnp.zeros_like(st.birth),
            usage=jnp.ones_like(st.usage),
            peak_n=jnp.zeros_like(st.peak_n),
            replace_n=jnp.zeros_like(st.replace_n),
            occ=jnp.full_like(st.occ, cap))

    # Phase 1: build + compile each variant (env knob read at trace time).
    runs = {}
    for c in CHUNKS:
        os.environ["VFLOOD_OCC_CHUNK"] = str(c)
        fb = FeatureBank(obj_n=2, memory_budget=BUDGET, dtype=jnp.bfloat16)
        eng = VideoSegEngine(model, variables, fb, downsample=OPERATING,
                             postprocess="device" if not SMOKE else False)
        st0 = eng.bootstrap(frame0, mask0)
        frames = [eng.upload(f) for f in base[1:3]]
        t0 = time.time()
        st, lab = eng.step(jax.tree.map(jnp.copy, st0), frames[0], 1.0)
        force(lab)
        print(f"[chunk={c}] warm/compile {time.time() - t0:.1f}s",
              flush=True)
        runs[c] = {"eng": eng, "st0": st0, "frames": frames,
                   "floor": fetch_floor(lab),
                   "full": [], "empty": []}

    def timed(eng, st, frames, floor):
        for leaf in jax.tree_util.tree_leaves(st):
            force(leaf)
        # warm one step off the clock (drains any pending work)
        st, lab = eng.step(st, frames[0], 100.0)
        force(lab)
        t0 = time.time()
        for i in range(STEPS):
            st, lab = eng.step(st, frames[i % 2], 101.0 + i)
        force(lab)
        return (time.time() - t0 - floor) / STEPS * 1000.0

    # Phase 2: interleaved repeats, rotated; each visit times full + empty.
    for rep in range(REPS):
        order = CHUNKS[rep % len(CHUNKS):] + CHUNKS[:rep % len(CHUNKS)]
        for c in order:
            r = runs[c]
            st_full = full_state(r["eng"], jax.tree.map(jnp.copy, r["st0"]))
            r["full"].append(round(timed(r["eng"], st_full,
                                         r["frames"], r["floor"]), 2))
            st_empty = jax.tree.map(jnp.copy, r["st0"])
            r["empty"].append(round(timed(r["eng"], st_empty,
                                          r["frames"], r["floor"]), 2))

    print(f"\n=== occ-chunk A/B (ms/frame fused step, best of {REPS} "
          f"interleaved) ===")
    for c in CHUNKS:
        r = runs[c]
        print(f"chunk={c:6d}: full-bank best {min(r['full']):6.2f} ms "
              f"all {r['full']}  | near-empty best {min(r['empty']):6.2f} ms "
              f"all {r['empty']}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
