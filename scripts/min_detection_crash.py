#!/usr/bin/env python
"""Minimize the fused-detection TPU-worker crash (VERDICT r4 #8).

Round 4 found the WHOLE fused inference graph (jit_split=0) reproducibly
crashes the TPU worker at the full-scale keypoint operating point, while
each half runs fine — bisected into ``RCNNConfig.jit_split`` with no
recorded root cause. This driver shrinks the known-crashing config axis by
axis (backbone depth, keypoint head, input size, proposal count), keeping
only shrinks that STILL crash, to produce the smallest reproducing
configuration for a root-cause note / upstream report.

Each probe runs in a SUBPROCESS (``--probe '<json>'``): rc 0 = graph built
and ran; rc != 0 = crash; wall-timeout = UNKNOWN (remote compile can be
slow, not counted as a crash). A cooldown follows every crash so the
relay's stale device grant releases (CLAUDE.md: one TPU process at a
time; a dead worker holds its grant ~2 min).

Run on the real TPU:  python scripts/min_detection_crash.py --full
(without --full: baseline verification + the two most informative shrinks
only — every probe pays a cold remote compile, minutes each).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_TIMEOUT = float(os.environ.get("VFLOOD_MIN_PROBE_TIMEOUT", "2400"))
COOLDOWN = float(os.environ.get("VFLOOD_MIN_COOLDOWN", "150"))

BASE = {  # keypoint_rcnn_config at jit_split=0: known to crash (round 4)
    "blocks": [3, 4, 23, 3],
    "num_classes": 1,
    "with_keypoints": True,
    "post_nms_topk": 1000,
    "test_short_side": 800,
    "test_max_side": 1333,
}

# Shrink ladder per axis, most-informative first.
AXES = [
    ("blocks", [[3, 4, 6, 3], [1, 1, 1, 1]]),
    ("with_keypoints", [False]),
    ("test_short_side", [400, 224]),
    ("post_nms_topk", [200, 50]),
]


def probe(cfg_dict) -> str:
    """Run one fused-graph forward in a child process.
    Returns 'ran' | 'crash' | 'unknown'."""
    cmd = [sys.executable, os.path.abspath(__file__), "--probe",
           json.dumps(cfg_dict)]
    t0 = time.time()
    try:
        res = subprocess.run(cmd, cwd=REPO, timeout=PROBE_TIMEOUT,
                             capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"  probe TIMEOUT after {PROBE_TIMEOUT:.0f}s (unknown)",
              flush=True)
        return "unknown"
    dt = time.time() - t0
    if res.returncode == 0 and "PROBE_OK" in res.stdout:
        print(f"  probe ran ({dt:.0f}s)", flush=True)
        return "ran"
    tail = (res.stderr or res.stdout)[-400:]
    print(f"  probe CRASH rc={res.returncode} ({dt:.0f}s): ...{tail!r}",
          flush=True)
    time.sleep(COOLDOWN)
    return "crash"


def run_probe_child(cfg_json: str) -> None:
    cfg_dict = json.loads(cfg_json)
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfloodnet_tpu.models.detection import GeneralizedRCNN
    from vfloodnet_tpu.models.detection.meta import (RCNNConfig,
                                                     build_detector)

    cfg = RCNNConfig(jit_split=0,
                     blocks=tuple(cfg_dict.pop("blocks")), **cfg_dict)
    model = GeneralizedRCNN(cfg, dtype=jnp.float32)
    init = jax.jit(lambda key, im: model.init(key, im,
                                              method=model.init_all))
    variables = init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
    detector = build_detector(cfg, variables, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = (rng.rand(1080, 1920, 3) * 255).astype(np.uint8)
    inst = detector(img)
    print("PROBE_OK", len(inst), flush=True)


def main() -> None:
    full = "--full" in sys.argv
    print("baseline (must crash):", BASE, flush=True)
    if probe(BASE) != "crash":
        print("BASELINE DID NOT CRASH — the fused graph runs at full "
              "scale now; jit_split may be removable. Stopping.")
        return

    current = dict(BASE)
    axes = AXES if full else AXES[:2]
    for axis, ladder in axes:
        for value in ladder:
            cand = dict(current, **{axis: value})
            print(f"try {axis} = {value}", flush=True)
            if probe(cand) == "crash":
                current = cand          # keep the shrink, try shrinking more
            else:
                break                   # ran (or unknown): revert, next axis
    print("\nMINIMAL CRASHING CONFIG:", json.dumps(current), flush=True)
    print("(every listed axis value below/off it ran or is untried)")


if __name__ == "__main__":
    if "--probe" in sys.argv:
        run_probe_child(sys.argv[sys.argv.index("--probe") + 1])
    else:
        from vfloodnet_tpu.core.runtime import ensure_backend
        ensure_backend()
        main()
