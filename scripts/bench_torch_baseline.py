#!/usr/bin/env python
"""Measure the REFERENCE's own per-frame video-seg step on this host's CPU
(VERDICT r3 next #8: give ``vs_baseline`` a measured anchor instead of a
bare assumption).

Drives the torch oracle (tests/torch_oracle.py — the reference AFB-URR +
FeatureBank imported from /root/reference and executed, never copied)
through the complete test_video_seg.py:103-121 per-frame loop at the
production operating point: 1080p input, 480px bicubic short-side resize,
segment -> softmax -> memorize -> FeatureBank.update -> bicubic resize
back -> argmax -> cv2 largest-CC. Random init (identical FLOPs to trained
weights; note: random-init masks make the CC stage cheap-ish, which only
*flatters* the baseline).

Prints one JSON line: {"torch_cpu_fps": ..., "sec_per_frame": ...,
"host_cpus": ...}. Interpretation chain for BASELINE.md: the reference
requires CUDA (test_video_seg.py:131-134 raises without it) and documents
an 11 GB-GPU envelope (README.md:202); this CPU datapoint anchors the
workload's cost on measurable local hardware, and the assumed 8 fps GPU
denominator in bench.py sits between this floor and the mid-single-digit
fps that space-time-memory-class models report at 480p.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_FRAMES = int(os.environ.get("VFLOOD_TORCH_BASELINE_FRAMES", "3"))


def main():
    import torch
    import torch.nn.functional as NF

    from tests.test_e2e_parity import _tv_resize
    from tests.torch_oracle import load_reference

    afb_mod, fb_mod = load_reference()   # installs torchvision stubs

    sys.path.insert(0, "/root/reference")
    import myutils
    torch.manual_seed(0)
    model = afb_mod.AFB_URR(torch.device("cpu"), update_bank=True,
                            load_imagenet_params=False)
    model.eval()

    from PIL import Image
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fdir = os.path.join(repo, "records", "demo_eval", "lake", "frames")
    names = sorted(os.listdir(fdir))
    frames = []
    for f in names[:1 + N_FRAMES]:
        im = Image.open(os.path.join(fdir, f)).convert("RGB")
        arr = np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0
        frames.append(torch.from_numpy(arr)[None])
    h, w = frames[0].shape[-2:]

    mask = np.zeros((h, w), np.float32)
    mask[h // 2:, :] = 1.0
    onehot = torch.from_numpy(np.stack([1.0 - mask, mask]))[None]

    fb = fb_mod.FeatureBank(2, 250_000, torch.device("cpu"),
                            update_rate=0.1, thres_close=0.95)
    with torch.no_grad():
        f0 = _tv_resize(frames[0], 480, "bicubic")
        m0 = _tv_resize(onehot, 480, "nearest")
        k4l, v4l = model.memorize(f0, m0)
        fb.init_bank(list(k4l), list(v4l))

        times = []
        for idx, fr in enumerate(frames[1:]):
            t0 = time.time()
            small = _tv_resize(fr, 480, "bicubic")
            score, _ = model.segment(small, fb)
            pred_mask = NF.softmax(score, dim=1)
            k4l, v4l = model.memorize(small, pred_mask)
            fb.update(list(k4l), list(v4l), idx + 1)
            pred = _tv_resize(pred_mask, (h, w), "bicubic")
            pred = torch.argmax(pred[0], dim=0).numpy().astype(np.uint8)
            pred = myutils.postprocessing_pred(pred)
            times.append(time.time() - t0)
            print(f"# frame {idx}: {times[-1]:.2f}s", file=sys.stderr)

    sec = float(np.median(times))
    print(json.dumps({
        "metric": "reference_torch_cpu_fps",
        "torch_cpu_fps": round(1.0 / sec, 4),
        "sec_per_frame": round(sec, 2),
        "frames": len(times),
        "host_cpus": os.cpu_count(),
        "operating_short_side": 480,
        "input": f"{h}x{w}",
    }))


if __name__ == "__main__":
    main()
