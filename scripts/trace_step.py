#!/usr/bin/env python
"""Capture a jax.profiler device trace of the fused video step and print a
per-category op-time table.

The axon relay executes lazily, but jax.profiler traces DO record true
device op times through it (docs/ROADMAP.md day-10) — this is the trusted
way to attribute the fused step's milliseconds. Runs a few warm steps under
``jax.profiler.trace`` and aggregates the perfetto JSON by op name prefix.

Run on the real TPU: python scripts/trace_step.py [out_dir]
Smoke (CPU): VFLOOD_AB_SMOKE=1 python scripts/trace_step.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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
BUDGET = 4096 if SMOKE else 250_000
STEPS = 4


def _categorize(name: str) -> str:
    """Map an XLA op name to a coarse stage bucket."""
    n = name.lower()
    for key, cat in (
            ("convolution", "convolution"),
            ("conv", "convolution"),
            ("dot", "matmul/dot"),
            ("reduce-window", "pools"),
            ("scatter", "scatter"),
            ("gather", "gather"),
            ("while", "while(CC)"),
            ("sort", "sort(evict)"),
            ("all-reduce", "collectives"),
            ("copy", "layout-copy"),
            ("transpose", "layout-copy"),
            ("reshape", "formatting"),
            ("bitcast", "formatting"),
            ("broadcast", "formatting"),
            ("concatenate", "formatting"),
            ("slice", "formatting"),
            ("pad", "formatting"),
            ("fusion", "fusion(elementwise)"),
    ):
        if key in n:
            return cat
    return "other"


def aggregate(trace_dir: str, n_steps: int):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep only device-lane complete events (phase X with a duration)
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "/device" in n.lower()}
    cats = defaultdict(float)
    ops = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur_ms = e["dur"] / 1000.0
        if name.startswith("jit_"):
            # whole-module parent event: its duration IS the fused step
            # time; children are reported separately, so keep it out of
            # the category sums to avoid double counting.
            ops[name] += dur_ms
            continue
        cats[_categorize(name)] += dur_ms
        ops[name] += dur_ms
        total += dur_ms
    print(f"\ntrace: {path}")
    print(f"total device op time: {total:.2f} ms over {n_steps} steps "
          f"= {total / n_steps:.2f} ms/step")
    print("\nper-category (ms/step):")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:22s} {ms / n_steps:7.3f}")
    print("\ntop-15 ops (ms/step):")
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms / n_steps:7.3f}  {name[:90]}")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vflood_trace"
    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.pipelines.loaders import load_afb_urr
    from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
    from vfloodnet_tpu.utils import force
    from bench import _bench_frames

    model, variables = load_afb_urr(None, dtype=jnp.bfloat16)
    fb = FeatureBank(obj_n=2, memory_budget=BUDGET, dtype=jnp.bfloat16)
    eng = VideoSegEngine(model, variables, fb, downsample=OPERATING,
                         postprocess="device" if not SMOKE else False)
    rng = np.random.RandomState(0)
    base = _bench_frames(RES, rng, n=3)
    mask0 = np.zeros(RES, np.uint8)
    mask0[RES[0] // 2:, :] = 1
    st = eng.bootstrap(base[0].astype(np.float32) / 255.0, mask0)
    frames = [eng.upload(f) for f in base[1:3]]
    st, lab = eng.step(st, frames[0], 1)     # warm/compile
    force(lab)

    with jax.profiler.trace(out_dir):
        for i in range(STEPS):
            st, lab = eng.step(st, frames[i % 2], 2 + i)
        force(lab)                           # execute inside the trace
    aggregate(out_dir, STEPS)


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
