#!/usr/bin/env python
"""Round-5 conv-efficiency A/B: fused-step time under knob variants,
measured WITHIN one session with interleaved repeats (round-4 doctrine:
cross-session relay load swings 4x, so only same-session interleaved
comparisons are trustworthy; docs/ROADMAP.md day-11 s2d A/B).

Variants (single-stream fused step, trained-demo bf16, 1080p/480):
  base    : two-conv KeyValue (VFLOOD_KV_FUSED=0), cc_scale=8
  kvfused : one 1024->640 KeyValue conv,           cc_scale=8
  cc16    : two-conv KeyValue,                     cc_scale=16
  both    : fused KeyValue,                        cc_scale=16

Phase 1 compiles all four graphs (cold remote compiles for the new ones);
phase 2 rotates the variants REPS times, timing a 16-step chained run each
visit (forced-fetch, floor-subtracted — scripts/_bench_timing.py).

Run on the real TPU: python scripts/bench_r5_ab.py
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

RES = (1080, 1920) if not os.environ.get("VFLOOD_AB_SMOKE") else (180, 320)
OPERATING = 480 if not os.environ.get("VFLOOD_AB_SMOKE") else 96
BUDGET = 250_000 if not os.environ.get("VFLOOD_AB_SMOKE") else 4096
REPS = int(os.environ.get("VFLOOD_BENCH_REPEATS", "5"))
STEPS = 16 if not os.environ.get("VFLOOD_AB_SMOKE") else 2

VARIANTS = [
    ("base", {"VFLOOD_KV_FUSED": "0"}, {"cc_scale": 8}),
    ("kvfused", {"VFLOOD_KV_FUSED": "1"}, {"cc_scale": 8}),
    ("cc16", {"VFLOOD_KV_FUSED": "0"}, {"cc_scale": 16}),
    ("both", {"VFLOOD_KV_FUSED": "1"}, {"cc_scale": 16}),
]


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
    base_frames = _bench_frames(RES, rng, n=3)
    mask0 = np.zeros(RES, np.uint8)
    mask0[RES[0] // 2:, :] = 1

    # Phase 1: build + warm (compile) every variant. The env knob is read
    # at TRACE time, so flipping os.environ before the first step of each
    # engine selects its lowering.
    runs = {}
    for name, env, kw in VARIANTS:
        os.environ.update(env)
        fb = FeatureBank(obj_n=2, memory_budget=BUDGET, dtype=jnp.bfloat16)
        eng = VideoSegEngine(model, variables, fb, downsample=OPERATING,
                             postprocess="device", **kw)
        st = eng.bootstrap(base_frames[0].astype(np.float32) / 255.0, mask0)
        frames = [eng.upload(f) for f in base_frames[1:3]]
        t0 = time.time()
        st, lab = eng.step(st, frames[0], 1.0)
        force(lab)
        print(f"[{name}] warm/compile {time.time() - t0:.1f}s", flush=True)
        runs[name] = {"eng": eng, "state": st, "frames": frames,
                      "floor": fetch_floor(lab), "best": float("inf"),
                      "all": []}

    # Phase 2: interleaved timed repeats, rotated order.
    order = [name for name, _, _ in VARIANTS]
    for rep in range(REPS):
        for name in order[rep % len(order):] + order[:rep % len(order)]:
            r = runs[name]
            eng = r["eng"]
            st = jax.tree.map(jnp.copy, r["state"])
            for leaf in jax.tree_util.tree_leaves(st):
                force(leaf)          # materialize copies outside the chain
            t0 = time.time()
            for i in range(STEPS):
                st, lab = eng.step(st, r["frames"][i % 2],
                                   float(2 + rep * STEPS + i))
            force(lab)
            ms = (time.time() - t0 - r["floor"]) / STEPS * 1000.0
            r["all"].append(round(ms, 2))
            r["best"] = min(r["best"], ms)

    print("\n=== round-5 A/B (ms/frame fused step, best of "
          f"{REPS} interleaved) ===")
    for name, _, kw in VARIANTS:
        r = runs[name]
        print(f"{name:8s} cc_scale={kw['cc_scale']:2d}: "
              f"best {r['best']:6.2f} ms  all {r['all']}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
