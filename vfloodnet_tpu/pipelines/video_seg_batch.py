"""Multi-stream video propagation: B independent videos per device step.

The reference processes one video at a time on one GPU (test_video_seg.py).
Video propagation is sequential in t (frame t needs the bank from t-1), so
the TPU-native way to raise utilisation is batching *across videos*
(SURVEY.md §7.3): B same-resolution streams run as one vmapped jitted step —
encoders, attention reads and bank updates all batch on the MXU; each stream
keeps its own fixed-capacity bank.

Streams can be heterogeneous in length: a finished stream keeps a live slot
(masked no-op is avoided by the host simply not consuming its outputs) until
the group is refilled; for simplicity the driver groups equal-resolution
videos and pads the last group.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..memory import FeatureBank, FeatureBankState
from ..models import AFBURR
from .loaders import cast_floating_params
from .video_seg import (device_largest_cc, pack_bits, resolve_postprocess,
                        to_onehot, unpack_bits)


class BatchVideoSegEngine:
    """Jitted B-stream propagation engine (fixed B, resolution, obj_n).

    ``postprocess``: largest-CC cleanup placement, as in
    :class:`~vfloodnet_tpu.pipelines.video_seg.VideoSegEngine` ('auto'
    default picks device CC on accelerator + few-CPU hosts).
    """

    def __init__(self, model: AFBURR, variables, fb: FeatureBank,
                 batch: int, downsample: int = 480, postprocess="auto",
                 memorize_every: int = 1, cc_scale: int = 16):
        self.model = model
        if model.dtype != jnp.float32:     # see cast_floating_params
            variables = cast_floating_params(variables, model.dtype)
        # Weights as jit ARGUMENTS, not closure constants — keeps the
        # persistent compile cache valid across checkpoint changes (see
        # VideoSegEngine.__init__).
        self.variables = jax.device_put(variables)
        self.fb = fb
        self.batch = batch
        self.downsample = downsample
        self.postprocess = resolve_postprocess(postprocess)
        self.memorize_every = max(1, int(memorize_every))
        self.cc_scale = int(cc_scale)
        self.full_hw: Optional[Tuple[int, int]] = None

        @jax.jit
        def _init_banks(variables, frames_small, masks_small):
            def one(frame, mask):
                return model.apply(variables, frame, mask,
                                   method=model.memorize)
            return jax.vmap(one)(frames_small, masks_small)

        def _make_step(update_bank: bool):
          @partial(jax.jit, donate_argnums=0)
          def _step(state: FeatureBankState, variables, frames_u8,
                    frame_idx):
            """frames_u8 [B, H, W, 3] uint8; state arrays carry a leading
            [B] stream axis. ``update_bank=False`` compiles the read-only
            variant used on skipped frames when ``memorize_every > 1``
            (see VideoSegEngine._step)."""
            # Prep in the model's compute dtype (see VideoSegEngine._step):
            # for bf16 production the B-stream 1080p normalize + bicubic
            # downsample halves its HBM traffic, and the encoders cast the
            # frames to bf16 anyway.
            cd = model.dtype
            frames = frames_u8.astype(cd) / jnp.asarray(255.0, cd)
            small_hw = ops.short_side_size(*frames_u8.shape[1:3],
                                           self.downsample)
            frames_small = ops.resize(frames, small_hw, "bicubic",
                                      spatial_axes=(1, 2))

            # Shared work bound across all streams/objects (closure-captured
            # so it stays unbatched under the stream vmap — one trip count).
            occ_all = state.occ

            def seg_one(frame, keys, values, valid):
                score, _, cnt = model.apply(variables, frame[None], keys,
                                            values, valid, False,
                                            method=model.segment,
                                            bank_occ=occ_all)
                return score[0], cnt

            scores, cnts = jax.vmap(seg_one)(frames_small, state.keys,
                                             state.values, state.valid)
            preds = jax.nn.softmax(scores, axis=1)     # [B, obj, h, w]

            usage = state.usage + jnp.log1p(cnts)
            usage = jnp.where(state.valid, jnp.clip(usage, 0.0, 1e5), 0.0)
            state = state.replace(usage=usage)

            if update_bank:                    # static at trace time
                def mem_one(frame, pred):
                    return model.apply(variables, frame, pred,
                                       method=model.memorize)

                k4, v4 = jax.vmap(mem_one)(frames_small, preds)

                def upd_one(st, nk, nv):
                    return self.fb.update(st, nk, nv, frame_idx)

                state = jax.vmap(upd_one)(state, k4, v4)

            full_hw = frames_u8.shape[1:3]
            if self.fb.obj_n == 2:
                # binary: upsample the single difference channel (argmax over
                # {bg, fg} == sign(fg - bg); bicubic is linear)
                # The upsample only feeds a sign test, so it runs in the
                # compute dtype too (see VideoSegEngine._step).
                diff = (preds[:, 1] - preds[:, 0]).astype(cd)
                up = ops.resize(diff, full_hw, "bicubic",
                                spatial_axes=(-2, -1))
                labels = (up > 0).astype(jnp.uint8)             # [B, H, W]
                labels_small = (diff > 0).astype(jnp.uint8)
            else:
                up = ops.resize(preds, full_hw, "bicubic",
                                spatial_axes=(-2, -1))
                labels = jnp.argmax(up, axis=1).astype(jnp.uint8)
                labels_small = jnp.argmax(preds, axis=1).astype(jnp.uint8)
            if self.postprocess == "device":    # static at trace time
                labels = jax.vmap(
                    partial(device_largest_cc, scale=self.cc_scale))(
                        labels, labels_small)
            if self.fb.obj_n == 2:              # binary masks go bit-packed
                labels = jax.vmap(pack_bits)(labels)
            return state, labels
          return _step

        self._jit_init_banks = _init_banks
        self._init_banks = lambda f, m: _init_banks(self.variables, f, m)
        self._jit_step = _make_step(True)
        self._step = lambda s, f, i: self._jit_step(s, self.variables, f, i)
        # Read-only step only exists (and compiles) when frames get skipped.
        if self.memorize_every > 1:
            self._jit_step_ro = _make_step(False)
            self._step_ro = lambda s, f, i: self._jit_step_ro(
                s, self.variables, f, i)
        else:
            self._jit_step_ro = self._jit_step
            self._step_ro = self._step

    def bootstrap(self, first_frames: Sequence[np.ndarray],
                  first_masks: Sequence[np.ndarray]) -> FeatureBankState:
        """first_frames: B HWC images (uint8 or float01); first_masks: B
        label maps."""
        assert len(first_frames) == self.batch
        frames = np.stack([np.asarray(f, np.float32) / 255.0
                           if np.asarray(f).dtype == np.uint8
                           else np.asarray(f, np.float32)
                           for f in first_frames])
        self.full_hw = frames.shape[1:3]
        small_hw = ops.short_side_size(*frames.shape[1:3], self.downsample)
        frames_small = ops.resize(jax.device_put(frames), small_hw,
                                  "bicubic", spatial_axes=(1, 2))
        masks = np.stack([to_onehot(np.asarray(m), self.fb.obj_n)
                          for m in first_masks])
        masks_small = ops.resize(jax.device_put(masks), small_hw, "nearest_torch",
                                 spatial_axes=(-2, -1))
        k4, v4 = self._init_banks(frames_small, masks_small)

        def init_one(k, v):
            return self.fb.init_bank(k, v)

        return jax.vmap(init_one)(k4, v4)

    def step(self, state: FeatureBankState, frames, frame_idx: int
             ) -> Tuple[FeatureBankState, jnp.ndarray]:
        """frames: [B, H, W, 3] uint8 numpy or device array."""
        if not isinstance(frames, jax.Array):
            frames = np.asarray(frames)
            if frames.dtype != np.uint8:
                frames = (frames * 255.0 + 0.5).astype(np.uint8)
            frames = jax.device_put(frames)
        fn = (self._step if frame_idx % self.memorize_every == 0
              else self._step_ro)
        return fn(state, frames, jnp.float32(frame_idx))

    def fetch_labels(self, labels) -> np.ndarray:
        """Device label handle (bit-packed when obj_n == 2) -> host uint8
        [B, H, W]."""
        arr = np.asarray(jax.device_get(labels))
        if self.fb.obj_n == 2 and self.full_hw is not None:
            arr = unpack_bits(arr, self.full_hw[1])
        return arr


def run_video_segmentation_batch(test_paths: Sequence[str],
                                 test_names: Sequence[str],
                                 out_dir: str, model, variables,
                                 budget: int = 250_000,
                                 downsample: int = 480,
                                 viz: bool = True,
                                 image_model_path: Optional[str] = None,
                                 memorize_every: int = 1,
                                 cc_scale: int = 16
                                 ) -> dict:
    """Propagate several same-resolution videos simultaneously.

    Output tree per video matches the single-stream CLI
    (``<out_dir>/<name>/{mask,overlay}``). Streams must share frame
    resolution; shorter videos stop being written once exhausted.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor
    from glob import glob

    from ..utils import FrameSecondMeter, gct, load_mask, save_overlay, \
        save_seg_mask
    from .video_seg import _decode, host_largest_cc

    b = len(test_paths)
    vids = []
    for path in test_paths:
        frames = sorted(glob(os.path.join(path, "*.jpg"))
                        + glob(os.path.join(path, "*.png")))
        if not frames:
            raise FileNotFoundError(path)
        vids.append(frames)

    mask_dirs, overlay_dirs = [], []
    first_frames, first_masks = [], []
    for name, frames in zip(test_names, vids):
        mask_dir = os.path.join(out_dir, name, "mask")
        overlay_dir = os.path.join(out_dir, name, "overlay")
        os.makedirs(mask_dir, exist_ok=True)
        if viz:
            os.makedirs(overlay_dir, exist_ok=True)
        mask_dirs.append(mask_dir)
        overlay_dirs.append(overlay_dir)
        first_name = os.path.splitext(os.path.basename(frames[0]))[0]
        first_mask_path = os.path.join(mask_dir, first_name + ".png")
        if not os.path.exists(first_mask_path):
            from .image_seg import run_image_segmentation
            run_image_segmentation(frames[0], name, out_dir,
                                   model_path=image_model_path)
        first_frames.append(_decode(frames[0]))
        first_masks.append(load_mask(first_mask_path))
        save_seg_mask(first_masks[-1], first_mask_path)
        if viz:
            save_overlay(first_frames[-1], first_masks[-1],
                         os.path.join(overlay_dir, first_name + ".png"))

    obj_n = max(int(m.max()) + 1 for m in first_masks)
    fb = FeatureBank(obj_n=obj_n, memory_budget=budget)
    engine = BatchVideoSegEngine(model, variables, fb, batch=b,
                                 downsample=downsample,
                                 memorize_every=memorize_every,
                                 cc_scale=cc_scale)
    state = engine.bootstrap(first_frames, first_masks)

    max_len = max(len(v) for v in vids)
    writer = ThreadPoolExecutor(max_workers=2)
    fps = FrameSecondMeter()
    writes = []

    def _write(vi, name, pred, frame):
        if engine.postprocess == "host":
            pred = host_largest_cc(pred)
        save_seg_mask(pred, os.path.join(mask_dirs[vi], name + ".png"))
        if viz:
            save_overlay(frame, pred,
                         os.path.join(overlay_dirs[vi], name + ".png"))

    def _flush(names, labels, frames):
        """Fetch (D2H inside the pool) then fan out per-stream writes."""
        labels_np = engine.fetch_labels(labels)
        for vi, name in enumerate(names):
            if name is not None:
                _write(vi, name, labels_np[vi], frames[vi])

    # Decode+upload prefetch (mirrors the single-stream loop,
    # video_seg.py:371-400): the next steps' B-frame batches are decoded and
    # H2D-queued while the device runs the current step.
    decode_pool = ThreadPoolExecutor(max_workers=2)
    PREFETCH = 3

    def _load(t):
        batch_frames, batch_names = [], []
        for frames in vids:
            idx = min(t, len(frames) - 1)       # pad exhausted streams
            batch_frames.append(_decode(frames[idx]))
            batch_names.append(
                os.path.splitext(os.path.basename(frames[idx]))[0]
                if t < len(frames) else None)
        return batch_names, jax.device_put(np.stack(batch_frames)), \
            batch_frames

    futures = {t: decode_pool.submit(_load, t)
               for t in range(1, min(max_len, 1 + PREFETCH))}
    pending = None   # (names, labels_device, frames_host)
    for t in range(1, max_len):
        batch_names, dev_frames, batch_frames = futures.pop(t).result()
        if t + PREFETCH < max_len:
            futures[t + PREFETCH] = decode_pool.submit(_load, t + PREFETCH)
        state, labels = engine.step(state, dev_frames, t)
        labels.copy_to_host_async()
        if pending is not None:                 # one step behind: overlapped
            writes.append(writer.submit(_flush, *pending))
        pending = (batch_names, labels, batch_frames)
        fps.add_frame_n(sum(1 for n in batch_names if n is not None))

    if pending is not None:
        _flush(*pending)
    for w in writes:
        w.result()
    fps.end()
    writer.shutdown()
    decode_pool.shutdown()
    print(gct(), f"batch throughput: {fps.fps:.3f} frames/s "
          f"({b} streams)")
    return {"fps": fps.fps, "frames": fps.frame_n}
