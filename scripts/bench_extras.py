#!/usr/bin/env python
"""Bench the BASELINE.json configs bench.py does not cover (VERDICT r3
next #5): single-image segmentation at 416^2, a genuine ~100-frame video
propagation (bank evolving across distinct frame indices), the fused
``--streaming`` water-level path, and Atlantis PSPNet eval throughput.

Emits ONE JSON line per stage as it completes (same staged contract as
bench.py — a killed run still leaves parsed lines). Timing is
relay-honest: every timed region ends in a real D2H fetch
(vfloodnet_tpu.utils.force) and subtracts the calibrated fetch floor
(docs/ROADMAP.md day-7).

Reference entry points being mirrored: test_image_seg.py (416x416 stills),
test_video_seg.py (propagation), est_waterlevel.py --opt ref (long-video
levels), test_atlantis_model.py (PSPNet 768 eval).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vfloodnet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAMES = os.path.join(REPO, "records", "demo_eval", "lake", "frames")
STILLS = [os.path.join(REPO, "records", "demo_train", d)
          for d in ("JPEGImages",)]
BUDGET_MIN = float(os.environ.get("VFLOOD_BENCH_BUDGET_EXTRAS", "45"))
REPEATS = max(1, int(os.environ.get("VFLOOD_BENCH_REPEATS", "3")))
_T0 = time.time()


def _left() -> float:
    return BUDGET_MIN - (time.time() - _T0) / 60.0


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _demo_frames_1080(n=8):
    from PIL import Image
    names = sorted(os.listdir(FRAMES))[:n]
    out = []
    for f in names:
        im = Image.open(os.path.join(FRAMES, f)).convert("RGB")
        if im.size[1] < im.size[0]:
            im = im.transpose(Image.ROTATE_90)
        im = im.resize((1920, 1080), Image.BILINEAR)
        out.append(np.asarray(im, np.uint8))
    return out


def _stills(n):
    """Real still images (cycled) for the image/atlantis stages."""
    from glob import glob

    from PIL import Image
    paths = []
    for d in STILLS:
        paths += sorted(glob(os.path.join(d, "*", "*.jpg"))
                        + glob(os.path.join(d, "*", "*.png")))
    if not paths:
        paths = [os.path.join(FRAMES, f) for f in sorted(os.listdir(FRAMES))]
    imgs = []
    for i in range(n):
        im = Image.open(paths[i % len(paths)]).convert("RGB")
        imgs.append(im)
    return imgs


def stage_image_seg():
    """End-to-end still-image segmentation (reference test_image_seg.py:
    416x416 resize + forward + full-res tail + palette PNG), images/sec."""
    import tempfile

    from vfloodnet_tpu.pipelines.image_seg import run_image_segmentation

    tmp = tempfile.mkdtemp(prefix="bench_img_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    for i, im in enumerate(_stills(24)):
        im.resize((1296, 972)).save(os.path.join(src, f"{i:03d}.jpg"))

    run_image_segmentation(src, "warm", tmp)          # compile + warm
    best = 0.0
    for _ in range(REPEATS):
        t0 = time.time()
        results = run_image_segmentation(src, "bench", tmp)
        best = max(best, len(results) / (time.time() - t0))
    _emit({"metric": "image_seg_416_fps_per_chip", "value": round(best, 3),
           "unit": "images/sec/chip", "n_images": 24,
           "platform": jax.devices()[0].platform})


def stage_video_100():
    """~100-frame propagation: the lake clip cycled with DISTINCT frame
    indices so the bank genuinely evolves (merge ratios shift, occupancy
    grows) — the long-propagation regime of test_video_seg.py rather than
    bench.py's 40-frame early-video stage."""
    from concurrent.futures import ThreadPoolExecutor
    import tempfile

    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.pipelines.loaders import load_afb_urr
    from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
    from vfloodnet_tpu.utils import force, save_seg_mask

    model, variables = load_afb_urr(None, dtype=jnp.bfloat16)
    fb = FeatureBank(obj_n=2, memory_budget=250_000, dtype=jnp.bfloat16)
    engine = VideoSegEngine(model, variables, fb, downsample=480,
                            postprocess="auto")
    frames_np = _demo_frames_1080()
    mask0 = np.zeros((1080, 1920), np.uint8)
    mask0[540:, :] = 1
    frames = [engine.upload(f) for f in frames_np]

    n = 100
    tmp = tempfile.mkdtemp(prefix="bench_v100_")

    def run_once():
        state = engine.bootstrap(
            frames_np[0].astype(np.float32) / 255.0, mask0)
        state, label = engine.step(state, frames[0], 1)
        force(label)                                   # warm + drain
        writer = ThreadPoolExecutor(max_workers=2)
        writes, pending = [], None
        t0 = time.time()
        for i in range(n):
            state, label = engine.step(state, frames[i % len(frames)], 2 + i)
            label.copy_to_host_async()
            if pending is not None:
                pi, pl = pending
                writes.append(writer.submit(
                    lambda pi=pi, pl=pl: save_seg_mask(
                        engine.fetch_label(pl), f"{tmp}/{pi:04d}.png")))
            pending = (i, label)
        save_seg_mask(engine.fetch_label(pending[1]),
                      f"{tmp}/{pending[0]:04d}.png")
        for w in writes:
            w.result()
        dt = time.time() - t0
        writer.shutdown()
        return n / dt, state

    best, state = run_once()
    for _ in range(REPEATS - 1):
        if _left() < 5:
            break
        f2, state = run_once()
        best = max(best, f2)
    occ = [int(v) for v in np.asarray(jax.device_get(state.occ))]
    _emit({"metric": "video_seg_100frame_fps_per_chip",
           "value": round(best, 3), "unit": "frames/sec/chip",
           "frames": n, "final_occupancy": occ,
           "platform": jax.devices()[0].platform})


def stage_streaming_waterlevel():
    """Fused device-resident water-level path (est_waterlevel --streaming):
    per-frame seg + on-device waterline scan + scalar-level fetch."""
    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.pipelines.loaders import load_afb_urr
    from vfloodnet_tpu.pipelines.streaming_waterlevel import \
        StreamingWaterLevel
    from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
    from vfloodnet_tpu.utils import force

    model, variables = load_afb_urr(None, dtype=jnp.bfloat16)
    fb = FeatureBank(obj_n=2, memory_budget=250_000, dtype=jnp.bfloat16)
    engine = VideoSegEngine(model, variables, fb, downsample=480,
                            postprocess="none")
    bbox_path = os.path.join(REPO, "records", "groundtruth", "LSU_demo",
                             "ref_bbox.txt")
    arr = np.loadtxt(bbox_path).astype(int)
    if arr.ndim == 1:
        arr = arr[None]
    sw = StreamingWaterLevel(engine, [tuple(b) for b in arr])

    frames_np = _demo_frames_1080()
    mask0 = np.zeros((1080, 1920), np.uint8)
    mask0[540:, :] = 1
    frames = [engine.upload(f) for f in frames_np]

    n = 100
    best = 0.0
    levels = []
    for _ in range(REPEATS):
        if best and _left() < 5:
            break
        state = engine.bootstrap(
            frames_np[0].astype(np.float32) / 255.0, mask0)
        state, lv, ls = sw.step(state, frames[0], 1)
        force(ls)
        # production async pattern: hits fetch in the background, levels
        # resolved at the end (timed — the fetches are part of the run)
        t0 = time.time()
        pendings = []
        for i in range(n):
            state, pending, _ = sw.step_async(state,
                                              frames[i % len(frames)],
                                              2 + i)
            pendings.append(pending)
        all_levels = [sw.resolve(p) for p in pendings]
        dt = time.time() - t0
        best = max(best, n / dt)
        levels = all_levels[-1]
    _emit({"metric": "streaming_waterlevel_fps_per_chip",
           "value": round(best, 3), "unit": "frames/sec/chip",
           "frames": n, "trackers": len(arr),
           "last_levels_px": [None if not np.isfinite(v) else round(v, 1)
                              for v in levels],
           "platform": jax.devices()[0].platform})


def stage_atlantis():
    """PSPNet-56 Atlantis eval throughput at the reference 768 padding
    (test_atlantis_model.py). Random init unless a trained checkpoint is
    present — FLOPs identical either way; the weights field marks it."""
    from vfloodnet_tpu.models.pspnet import PSPNet
    from vfloodnet_tpu.utils import force, fetch_floor

    model = PSPNet(num_classes=56)
    ckpt = os.path.join(REPO, "records", "atlantis_pspnet_tpu")
    if os.path.isdir(ckpt):
        from vfloodnet_tpu.core.checkpoint import restore_checkpoint
        dummy = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
        variables = restore_checkpoint(ckpt, target=dummy)
        weights = "trained"
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)))
        weights = "random-init"
    variables = jax.device_put(variables)
    pad = 768

    @jax.jit
    def forward(vs, img):
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        _, logits = model.apply(vs, ((img - mean) / std)[None])
        n, h, w, c = logits.shape
        up = jax.image.resize(logits, (n, pad, pad, c), method="linear")
        return jnp.argmax(up[0], axis=-1).astype(jnp.uint8)

    imgs = [np.asarray(im.resize((pad, pad)), np.float32) / 255.0
            for im in _stills(8)]
    dev = [jax.device_put(im) for im in imgs]
    pred = forward(variables, dev[0])
    force(pred)
    floor = fetch_floor(pred)
    n = 24
    best = 0.0
    for _ in range(REPEATS):
        t0 = time.time()
        for i in range(n):
            pred = forward(variables, dev[i % len(dev)])
        force(pred)
        best = max(best, n / (time.time() - t0 - floor))
    _emit({"metric": "atlantis_pspnet_768_fps_per_chip",
           "value": round(best, 3), "unit": "images/sec/chip",
           "weights": weights, "platform": jax.devices()[0].platform})


def main():
    stages = [("video_100", stage_video_100),
              ("streaming_waterlevel", stage_streaming_waterlevel),
              ("image_seg", stage_image_seg),
              ("atlantis", stage_atlantis)]
    only = os.environ.get("VFLOOD_BENCH_EXTRAS_ONLY")
    for name, fn in stages:
        if only and name != only:
            continue
        if _left() < 3:
            print(f"# stage {name} skipped: budget", file=sys.stderr)
            continue
        try:
            fn()
        except Exception as e:   # stage isolation: one failure, one line
            print(f"# stage {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
