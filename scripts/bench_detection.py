#!/usr/bin/env python
"""Microbench: reference-object detection throughput on device.

The BASELINE.md config "reference-object seg on stills"
(estimation/object_detection.py in the reference, Detectron2
DefaultPredictor): times the jitted GeneralizedRCNN forward — PointRend
X-101 (stop signs) and Keypoint R-CNN R-101 (people) — at the Detectron2
operating size (short side 800), random weights.

Device timing uses the shared chained-carry helper (scripts/_bench_timing:
the axon relay dedupes repeated identical executions). The full host-level
detector round-trip (preprocess + dispatch + D2H of boxes/masks) is timed
separately per-call.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_timing import timeit  # noqa: E402

print = functools.partial(print, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.models.detection import GeneralizedRCNN
    from vfloodnet_tpu.models.detection.meta import (build_detector,
                                                     keypoint_rcnn_config,
                                                     preprocess_bgr,
                                                     stopsign_rcnn_config)

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)

    rng = np.random.RandomState(0)
    img = (rng.rand(1080, 1920, 3) * 255).astype(np.uint8)  # 1080p still

    only = os.environ.get("VFLOOD_BENCH_DET_ONLY")  # 'stopsign' | 'people'
    dtype = (jnp.bfloat16 if os.environ.get("VFLOOD_BENCH_DET_DTYPE")
             == "bf16" else jnp.float32)
    configs = (("pointrend_x101 (stopsign)", stopsign_rcnn_config()),
               ("keypoint_r101 (people)", keypoint_rcnn_config()))
    for name, cfg in configs:
        if only and only not in name:
            continue
        model = GeneralizedRCNN(cfg, dtype=dtype)
        init = jax.jit(lambda key, im, model=model:
                       model.init(key, im, method=model.init_all))
        from _bench_timing import force
        t0 = time.time()
        variables = init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
        force(variables)   # real sync (relay-lazy block_until_ready)
        print(f"{name}: init {time.time() - t0:.1f}s")

        detector = build_detector(cfg, variables, dtype=dtype)
        padded, _ = preprocess_bgr(img, cfg.test_short_side,
                                   cfg.test_max_side)
        print(f"  input {padded.shape}")

        # device-only forward, chained-carry timing (shared helper)
        dev_vars = jax.device_put(variables)
        dev_img = jax.device_put(padded)
        t0 = time.time()
        if cfg.jit_split:
            # the full fused graph crashes the TPU worker at this scale
            # (meta.py infer_front); time the production split-jit pieces
            def front(vs, im):
                return model.apply(vs, im, method=model.infer_front)

            hw = tuple(padded.shape[:2])
            ms_f = timeit(front, dev_vars, dev_img, iters=10)
            feats, props, pv = jax.jit(front)(dev_vars, dev_img)
            if int(cfg.jit_split) >= 2:
                def boxes_fn(vs, f, p, v):
                    return model.apply(vs, f, p, v, hw,
                                       method=model.infer_boxes)

                def tail_fn(vs, f, *det):
                    return model.apply(vs, f, *det,
                                       method=model.infer_tail)

                ms_b = timeit(boxes_fn, dev_vars, feats, props, pv,
                              iters=10)
                det = jax.jit(boxes_fn)(dev_vars, feats, props, pv)
                ms_t = timeit(tail_fn, dev_vars, feats, *det, iters=10)
                ms = ms_f + ms_b + ms_t
                print(f"  front {ms_f:.1f} + boxes {ms_b:.1f} + tail "
                      f"{ms_t:.1f} ms (jit_split=2)")
            else:
                def back(vs, f, p, v):
                    return model.apply(vs, f, p, v, hw,
                                       method=model.infer_back)

                ms_b = timeit(back, dev_vars, feats, props, pv, iters=10)
                ms = ms_f + ms_b
                print(f"  front {ms_f:.1f} + back {ms_b:.1f} ms "
                      f"(jit_split)")
        else:
            ms = timeit(model.apply, dev_vars, dev_img, iters=10)
        print(f"  compile+bench      {time.time() - t0:.1f}s")
        print(f"  device forward     {ms:7.1f} ms/img ({1000.0/ms:.2f} fps)")

        # full host round trip (preprocess + jit dispatch + D2H + paste)
        inst = detector(img)                      # warm (compiles refine)
        t0 = time.time()
        for _ in range(5):
            inst = detector(img)
        rt_ms = (time.time() - t0) / 5 * 1000.0
        print(f"  host round-trip    {rt_ms:7.1f} ms/img "
              f"({1000.0/rt_ms:.2f} fps)  detections={len(inst)}")
        import json
        print(json.dumps({
            "metric": "detection_full_scale",
            "config": name,
            "input_hw": list(padded.shape[:2]),
            "device_forward_ms": round(ms, 1),
            "host_roundtrip_ms": round(rt_ms, 1),
            "fps": round(1000.0 / rt_ms, 3),
            "platform": jax.devices()[0].platform,
            "weights": "random-init",
            "dtype": "bf16" if dtype != jnp.float32 else "f32",
        }))


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
