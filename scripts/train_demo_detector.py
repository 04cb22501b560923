"""Train the tiny synthetic stop-sign detector and stage e2e demo scenes.

Puts REAL weights into the detection chain (VERDICT round-1 item 6): the
reference runs released Detectron2 COCO checkpoints
(estimation/object_detection.py:16-25) which cannot be downloaded here, so
a tiny GeneralizedRCNN (train/train_detection.py tiny_stopsign_config) is
trained on synthetic scenes until `est_waterlevel.py --opt stopsign`
produces a nonzero depth with no injected fake detectors.

Outputs:
  records/checkpoints/stopsign_tiny/best              orbax params
  records/checkpoints/stopsign_tiny/rcnn_config.json  variant sidecar
  records/demo_eval/stopsign/{frames,masks}/          e2e depth scenes

Run: python scripts/train_demo_detector.py [steps]
Env: VFLOOD_TRAIN_PLATFORM=cpu forces the CPU backend (default tpu).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VFLOOD_TRAIN_PLATFORM", "tpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_DIR = os.path.join(REPO, "records", "checkpoints", "stopsign_tiny")
EVAL_DIR = os.path.join(REPO, "records", "demo_eval", "stopsign")


def stage_eval_scenes(n: int = 2, size: int = 320, seed: int = 1234) -> None:
    """Depth-estimation scenes (submerged pole) + their GT water masks, in
    the CLI's expected layout (frames/*.png + masks/*.png)."""
    import cv2

    from vfloodnet_tpu.data.detection_dataset import render_stopsign_scene
    from vfloodnet_tpu.utils import save_seg_mask

    frames = os.path.join(EVAL_DIR, "frames")
    masks = os.path.join(EVAL_DIR, "masks")
    os.makedirs(frames, exist_ok=True)
    os.makedirs(masks, exist_ok=True)
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        # water band placed to submerge part of the pole
        sc = render_stopsign_scene(rng, size=size,
                                   water_level=float(rng.uniform(0.2, 0.35)))
        cv2.imwrite(os.path.join(frames, f"scene{i}.png"),
                    sc["image"].astype(np.uint8))
        save_seg_mask(sc["water_mask"], os.path.join(masks, f"scene{i}.png"))
    print(f"staged {n} e2e scenes under {EVAL_DIR}")


def main():
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from vfloodnet_tpu.core.checkpoint import save_checkpoint
    from vfloodnet_tpu.data.detection_dataset import SyntheticStopsignDataset
    from vfloodnet_tpu.models.detection.meta import GeneralizedRCNN
    from vfloodnet_tpu.train.train_detection import (
        DetectionTrainConfig, init_detection_train_state,
        make_detection_train_step, tiny_stopsign_config)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else \
        int(os.environ.get("VFLOOD_DET_STEPS", 1500))

    tc = DetectionTrainConfig()
    mc = tiny_stopsign_config(tc.image_size)
    model = GeneralizedRCNN(mc)
    init = jax.jit(lambda k, img: model.init(k, img, method=model.init_all))
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((tc.image_size, tc.image_size, 3)))
    variables = jax.device_get(variables)  # plain host tree for state init

    state, tx = init_detection_train_state(model, variables, tc)
    step_fn = make_detection_train_step(model, tx, tc)

    ds = SyntheticStopsignDataset(n=steps, size=tc.image_size, seed=tc.seed)
    t0 = time.time()
    loss_hist = []
    for i in range(steps):
        img, boxes, classes, masks, valid = ds.get(i)
        state, loss, aux = step_fn(state, jnp.asarray(img),
                                   jnp.asarray(boxes), jnp.asarray(classes),
                                   jnp.asarray(masks), jnp.asarray(valid))
        loss_hist.append(float(loss))
        if i % 50 == 0 or i == steps - 1:
            a = {k: round(float(v), 4) for k, v in aux.items()}
            print(f"step {i}/{steps} loss {float(loss):.4f} {a} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(CKPT_DIR, exist_ok=True)
    from vfloodnet_tpu.core.checkpoint import save_flat_npz
    blob = {"params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats)}
    save_checkpoint(os.path.join(CKPT_DIR, "best"), blob)
    save_flat_npz(os.path.join(CKPT_DIR, "best.npz"), blob)
    with open(os.path.join(CKPT_DIR, "rcnn_config.json"), "w") as f:
        json.dump(dataclasses.asdict(mc), f, indent=1)
    print(f"checkpoint saved: {CKPT_DIR} "
          f"(final loss {np.mean(loss_hist[-50:]):.4f})")

    stage_eval_scenes()

    # quick self-eval on a held-out scene
    from vfloodnet_tpu.data.detection_dataset import render_stopsign_scene
    from vfloodnet_tpu.models.detection.meta import build_detector

    rng = np.random.default_rng(9999)
    sc = render_stopsign_scene(rng, size=tc.image_size)
    det = build_detector(mc, {"params": state.params,
                              "batch_stats": state.batch_stats})
    inst = det(sc["image"].astype(np.uint8))
    print(f"self-eval: {len(inst)} detections; "
          f"classes {inst.classes.tolist()} scores "
          f"{np.round(inst.scores, 3).tolist()}")


if __name__ == "__main__":
    main()
