"""CC-scale experiment: fused-step time + mask agreement at cc_scale 2 vs 4.

The device largest-CC cleanup runs on a nearest-downsampled copy of the
operating-resolution mask (pipelines/video_seg.py::device_largest_cc); its
cost scales with pixel count. This measures whether quarter-res CC (scale 4)
is (a) materially faster end-to-end and (b) label-identical in practice.
Run on the TPU box: python scripts/bench_cc_scale.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine

RES = (1080, 1920)
N_TIME = 16
N_AGREE = 8

model = AFBURR(dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                       jnp.zeros((2, 48, 64)), method=model.init_all)

rng = np.random.RandomState(0)
frame0 = rng.rand(*RES, 3).astype(np.float32)
mask0 = np.zeros(RES, np.uint8)
mask0[RES[0] // 2:, :] = 1
frames = [(rng.rand(*RES, 3) * 255).astype(np.uint8) for _ in range(4)]


def build(scale):
    fb = FeatureBank(obj_n=2, memory_budget=250_000, dtype=jnp.bfloat16)
    eng = VideoSegEngine(model, variables, fb, downsample=480,
                         postprocess="device", cc_scale=scale)
    return eng


def run(eng, n, collect=False):
    from _bench_timing import fetch_floor, force
    state = eng.bootstrap(frame0, mask0)
    # warmup / compile + drain (block_until_ready is a dispatch fence only)
    state, label = eng.step(state, frames[0], 1)
    force(label)
    floor = fetch_floor(label)
    labels = []
    t0 = time.time()
    for i in range(n):
        state, label = eng.step(state, frames[i % len(frames)], i + 2)
        if collect:
            labels.append(eng.fetch_label(label))
    if not collect:
        force(label)       # executes the whole state-chained run
        dt = (time.time() - t0 - floor) / n
    else:
        dt = (time.time() - t0) / n
    return dt, labels


engines = {2: build(2), 4: build(4)}
times = {2: [], 4: []}
for rep in range(2):
    for s in (2, 4):
        dt, _ = run(engines[s], N_TIME)
        times[s].append(dt * 1000)
        print(f"rep{rep} scale={s}: {dt*1000:.2f} ms/frame", flush=True)

_, labs2 = run(engines[2], N_AGREE, collect=True)
_, labs4 = run(engines[4], N_AGREE, collect=True)
agree = [float((a == b).mean()) for a, b in zip(labs2, labs4)]
ident = sum(1 for a, b in zip(labs2, labs4) if (a == b).all())

print(f"best ms/frame: scale2={min(times[2]):.2f} scale4={min(times[4]):.2f}")
print(f"agreement: min={min(agree):.6f} mean={np.mean(agree):.6f} "
      f"identical {ident}/{N_AGREE}")
