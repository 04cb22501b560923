#!/usr/bin/env python
"""A/B: vmapped-batched vs unbatched eviction-gate predicate
(VFLOOD_EVICT_GATE), fused-step ms/frame on a near-empty production bank.

Background: bank_merge_append runs under jax.vmap over objects; a vmapped
lax.cond with a batched predicate lowers to select, so the round-4 LFU
gate silently executed its approx-top-k branch every step (~0.27 ms
profiled). The unbatched occ_bound predicate keeps a real branch.
Measured 10.32 -> 10.08 ms/frame (docs/ROADMAP.md round 5).

Run on the real TPU: python scripts/bench_evict_gate.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from vfloodnet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from _bench_timing import fetch_floor, force
from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.pipelines.loaders import load_afb_urr
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
from bench import _bench_frames

RES, OPERATING, BUDGET, STEPS, REPS = (1080, 1920), 480, 250_000, 16, 4
model, variables = load_afb_urr(None, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
base = _bench_frames(RES, rng, n=3)
frame0 = base[0].astype(np.float32) / 255.0
mask0 = np.zeros(RES, np.uint8); mask0[RES[0] // 2:, :] = 1

runs = {}
for name, env in (("batched", "batched"), ("unbatched", "unbatched")):
    os.environ["VFLOOD_EVICT_GATE"] = env
    fb = FeatureBank(obj_n=2, memory_budget=BUDGET, dtype=jnp.bfloat16)
    eng = VideoSegEngine(model, variables, fb, downsample=OPERATING,
                         postprocess="device")
    st0 = eng.bootstrap(frame0, mask0)
    frames = [eng.upload(f) for f in base[1:3]]
    t0 = time.time()
    st, lab = eng.step(jax.tree.map(jnp.copy, st0), frames[0], 1.0)
    force(lab)
    print(f"[{name}] warm/compile {time.time() - t0:.1f}s", flush=True)
    runs[name] = {"eng": eng, "st0": st0, "frames": frames,
                  "floor": fetch_floor(lab), "all": []}

for rep in range(REPS):
    order = ["batched", "unbatched"] if rep % 2 == 0 else ["unbatched", "batched"]
    for name in order:
        r = runs[name]
        st = jax.tree.map(jnp.copy, r["st0"])
        for leaf in jax.tree_util.tree_leaves(st):
            force(leaf)
        st, lab = r["eng"].step(st, r["frames"][0], 100.0)
        force(lab)
        t0 = time.time()
        for i in range(STEPS):
            st, lab = r["eng"].step(st, r["frames"][i % 2], 101.0 + i)
        force(lab)
        r["all"].append(round((time.time() - t0 - r["floor"]) / STEPS * 1000.0, 2))

for name in ("batched", "unbatched"):
    r = runs[name]
    print(f"{name:10s}: best {min(r['all']):6.2f} ms/frame  all {r['all']}")
