"""Video water segmentation: memory-propagated per-frame inference.

TPU-native pipeline with the capability of the reference CLI loop
(test_video_seg.py:41-123): bootstrap from a first-frame mask, then per frame
segment -> memorize -> bank update. Redesigned for TPU:

- the entire per-frame transition (query encode, bank attention read, decode,
  memory encode, bank merge/append/evict, full-size upsample + argmax +
  largest-CC cleanup) is ONE jitted function over static shapes — masks stay
  device-resident; the only host traffic is JPEG decode in and a uint8 label
  map out per frame;
- host JPEG decode is overlapped with device compute via a prefetch thread;
- the feature bank is the fixed-capacity state in
  :mod:`vfloodnet_tpu.memory` (no reallocation / recompiles over the video).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from glob import glob
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..memory import FeatureBank, FeatureBankState
from ..models import AFBURR
from ..utils import (COLOR_PALETTE, FrameSecondMeter, gct, load_image,
                     load_mask, save_overlay, save_seg_mask)
from .loaders import cast_floating_params


def to_onehot(mask: np.ndarray, obj_n: int) -> np.ndarray:
    """Label mask [H, W] -> one-hot [obj_n, H, W] with background =
    1 - sum(objects) (reference ToOnehot, video transforms :383-424)."""
    oh = np.zeros((obj_n,) + mask.shape, np.float32)
    for i in range(1, obj_n):
        oh[i] = mask == i
    oh[0] = 1.0 - oh[1:].sum(axis=0).clip(0.0, 1.0)
    return oh


def pack_bits(label: jnp.ndarray) -> jnp.ndarray:
    """Binary [H, W] uint8 label -> bit-packed [H, ceil(W/8)] uint8 (8x less
    D2H traffic through the host tunnel). Row-major MSB-first, matching
    ``np.packbits(..., axis=1)``. Unrolled shift-or (a uint8 broadcast
    multiply-reduce lowers ~20x slower on TPU)."""
    h, w = label.shape
    wpad = -(-w // 8) * 8
    lab = jnp.pad(label, ((0, 0), (0, wpad - w))).astype(jnp.int32)
    bits = lab.reshape(h, wpad // 8, 8)
    out = bits[..., 7]
    for k in range(7):
        out = out | (bits[..., k] << (7 - k))
    return out.astype(jnp.uint8)


def unpack_bits(arr: np.ndarray, w: int) -> np.ndarray:
    """Host inverse of :func:`pack_bits` over the last axis (any leading
    axes)."""
    return np.unpackbits(arr, axis=-1)[..., :w]


def device_largest_cc(label_full: jnp.ndarray,
                      label_small: jnp.ndarray,
                      scale: int = 16,
                      dilate: int = 1) -> jnp.ndarray:
    """Largest-CC cleanup on device. The component filter runs at 1/scale of
    the small operating resolution (CC topology is scale-invariant for the
    bicubically upsampled mask, and the label-propagation cost scales with
    pixel count) and the keep-mask is dilated one coarse cell before the
    nearest upsample, so full-res boundary pixels whose coarse cell aliased
    to background survive — same behaviour as the reference's full-res
    ``postprocessing_pred`` (myutils/data.py:17-37) at a fraction of the
    cost. Measured vs the full-res host CC on the demo-clip masks (+ false
    blobs / salt-noise variants), scripts/bench_cc_accuracy.py: scale 4 +
    dilation IoU >= 0.99992, scale 8 >= 0.99986, scale 16 >= 0.99978 on
    every mask (undilated scale 2 was 0.9976). Default scale 16 shrinks the
    CC grid to 30x53 at the 480 operating point — measured -0.15 ms/frame
    vs scale 8 in the round-5 interleaved A/B (scripts/bench_r5_ab.py) at
    min IoU 0.99978; falls back to the un-scaled grid when the operating
    resolution is too small for a 16x grid."""
    h, w = label_small.shape[-2:]
    if scale > 1 and min(h, w) // scale >= 16:
        cc_in = ops.resize(label_small, (h // scale, w // scale), "nearest",
                           spatial_axes=(-2, -1))
    else:
        cc_in = label_small
    keep = ops.largest_connected_component(cc_in)
    # ``dilate``-cell 8-neighbour dilation (max-pool via pad+slice)
    for _ in range(max(0, int(dilate))):
        p = jnp.pad(keep, 1)
        keep = jnp.maximum(keep, jnp.maximum(
            jnp.maximum(jnp.maximum(p[:-2, 1:-1], p[2:, 1:-1]),
                        jnp.maximum(p[1:-1, :-2], p[1:-1, 2:])),
            jnp.maximum(jnp.maximum(p[:-2, :-2], p[:-2, 2:]),
                        jnp.maximum(p[2:, :-2], p[2:, 2:]))))
    keep_full = ops.resize(keep, label_full.shape, "nearest",
                           spatial_axes=(-2, -1))
    return label_full * keep_full


def resolve_postprocess(postprocess) -> str:
    """Normalise the largest-CC postprocess mode ('auto' picks the device op
    when an accelerator backs the process but the host has too few CPUs to
    overlap the cv2 cleanup)."""
    if postprocess is True:
        return "device"
    if postprocess is False:
        return "none"
    if postprocess == "auto":
        on_accel = jax.devices()[0].platform != "cpu"
        few_cpus = (os.cpu_count() or 1) < 4
        return "device" if (on_accel and few_cpus) else "host"
    return postprocess


def host_largest_cc(label: np.ndarray) -> np.ndarray:
    """Host-side largest-CC cleanup, for use inside the overlapped writer
    pool — behaviourally identical to the device op but off the device
    critical path. Uses cv2's SIMD connected components when available
    (~12x faster than scipy at 1080p; also what the reference's
    ``postprocessing_pred`` uses, myutils/data.py:19), scipy otherwise."""
    try:
        import cv2
        n, lab, stats, _ = cv2.connectedComponentsWithStats(
            np.ascontiguousarray(label, np.uint8), connectivity=8)
        if n <= 1:
            return np.zeros_like(label, np.uint8)
        if n == 2:
            return (lab == 1).astype(np.uint8)
        biggest = 1 + int(stats[1:, cv2.CC_STAT_AREA].argmax())
        return (lab == biggest).astype(np.uint8)
    except ImportError:
        from scipy import ndimage
        lab, n = ndimage.label(label, structure=np.ones((3, 3), int))
        if n <= 1:
            return (lab > 0).astype(np.uint8)
        sizes = np.bincount(lab.ravel())
        sizes[0] = 0
        return (lab == sizes.argmax()).astype(np.uint8)


class VideoSegEngine:
    """Jitted propagation engine for one video resolution.

    ``postprocess``: largest-CC mask cleanup mode —
      - 'host': applied on host inside the writer pool (overlapped, zero
        device cost),
      - 'device' / True: jitted device op chained after the step (keeps the
        cleaned mask device-resident for device-side consumers),
      - 'none' / False: disabled,
      - 'auto' (default): 'device' when an accelerator backs the engine but
        the host has too few CPUs to overlap the cv2 cleanup (~50 ms/frame
        at 1080p), 'host' otherwise.
    """

    def __init__(self, model: AFBURR, variables, fb: FeatureBank,
                 downsample: int = 480, postprocess="auto",
                 memorize_every: int = 1, cc_scale: int = 16):
        self.model = model
        if model.dtype != jnp.float32:     # see cast_floating_params
            variables = cast_floating_params(variables, model.dtype)
        # Weights are passed INTO the jitted step as arguments (device-put
        # once here), not closed over: closure-captured weights become
        # compile-time constants, so every checkpoint/weight change would
        # invalidate the persistent compile cache and force a fully cold
        # 5-40 min remote compile (the round-2 bench died exactly this way).
        # As arguments they key the cache on shape/dtype only.
        self.variables = jax.device_put(variables)
        self.fb = fb
        self.downsample = downsample
        self.postprocess = resolve_postprocess(postprocess)
        self.memorize_every = max(1, int(memorize_every))
        self.cc_scale = int(cc_scale)
        self.full_hw = None

        @jax.jit
        def _init_bank(variables, frame_small, mask_small):
            k4, v4 = model.apply(variables, frame_small, mask_small,
                                 method=model.memorize)
            return k4, v4

        pack = fb.obj_n == 2

        def _make_raw_step(update_bank: bool):
          def _step(state: FeatureBankState, variables, frame_u8, frame_idx):
            """One frame: normalize + downsample + segment + memorize + bank
            update + full-res upsample (+ device CC cleanup + bit-packing,
            when enabled) — ONE jitted graph, ONE dispatch per frame (each
            dispatch is an RPC through the host tunnel).

            ``frame_u8`` is the full-res uint8 frame: uploading uint8 and
            normalising on device is 4x less H2D traffic (the dominant
            per-frame cost through the host tunnel), and donating the bank
            state lets XLA update the 0.5 GB bank buffers in place.

            ``update_bank=False`` compiles the read-only variant used on
            skipped frames when ``memorize_every > 1``: segmentation + usage
            bookkeeping without memorize / merge / evict (the reference
            memorizes every frame, test_video_seg.py:111-112 — this knob is
            an opt-in speed/accuracy trade beyond the reference).
            """
            # Prep runs in the model's compute dtype: for bf16 production the
            # 1080p normalize + bicubic downsample halves its HBM traffic,
            # and the encoders cast the frame to bf16 anyway.
            cd = model.dtype
            frame_full = frame_u8.astype(cd) / jnp.asarray(255.0, cd)
            small_hw = ops.short_side_size(*frame_u8.shape[:2],
                                           self.downsample)
            frame_small = ops.resize(frame_full, small_hw, "bicubic",
                                     spatial_axes=(0, 1))
            score, _, cnt = model.apply(
                variables, frame_small[None], state.keys, state.values,
                state.valid, False, method=model.segment,
                bank_occ=state.occ)
            pred = jax.nn.softmax(score, axis=1)          # [1, obj, h, w]

            state = fb.record_usage(state, cnt)
            if update_bank:                    # static at trace time
                k4, v4 = model.apply(variables, frame_small, pred[0],
                                     method=model.memorize)
                state = fb.update(state, k4, v4, frame_idx)

            # Full-resolution label map, device-side. For binary masks the
            # argmax over {bg, fg} equals sign(fg - bg), and bicubic resize
            # is linear, so upsampling the single difference channel halves
            # the resize cost with an identical result.
            full_hw = frame_u8.shape[:2]
            if fb.obj_n == 2:
                # The upsample only feeds a sign test, so it runs in the
                # compute dtype too (bf16 flips only |diff| ~ 1e-3 borderline
                # pixels — within the documented bf16 mask tolerance).
                diff = (pred[0, 1] - pred[0, 0]).astype(cd)
                up = ops.resize(diff, full_hw, "bicubic",
                                spatial_axes=(-2, -1))
                label_full = (up > 0).astype(jnp.uint8)
                label_small = (diff > 0).astype(jnp.uint8)
            else:
                up = ops.resize(pred[0], full_hw, "bicubic",
                                spatial_axes=(-2, -1))
                label_full = jnp.argmax(up, axis=0).astype(jnp.uint8)
                label_small = jnp.argmax(pred[0], axis=0).astype(jnp.uint8)
            if self.postprocess == "device":   # static at trace time
                label_full = device_largest_cc(label_full, label_small,
                                               scale=self.cc_scale)
            if pack:                           # binary masks go bit-packed
                label_full = pack_bits(label_full)
            return state, label_full, label_small
          return _step

        def _make_step(update_bank: bool):
            return partial(jax.jit, donate_argnums=0)(
                _make_raw_step(update_bank))

        def _make_step_n(k: int):
            """K frames in ONE jitted dispatch: ``lax.scan`` of the full
            per-frame step (bank update every frame, the reference contract —
            test_video_seg.py:111-112). The scan body is traced once, so the
            compiled graph is the same size as the single step; what it buys
            is K-fold amortisation of the per-dispatch RPC/dispatch overhead
            (material on relay-attached hosts, harmless on local ones).
            Labels for all K frames come back stacked along axis 0."""
            raw = _make_raw_step(True)

            @partial(jax.jit, donate_argnums=0)
            def _step_n(state: FeatureBankState, variables, frames_u8, idx0):
                offs = jnp.arange(k, dtype=jnp.float32)

                def body(st, inp):
                    frame, off = inp
                    st, label_full, _ = raw(st, variables, frame, idx0 + off)
                    return st, label_full

                return jax.lax.scan(body, state, (frames_u8, offs))
            return _step_n

        self._make_step_n = _make_step_n
        self._step_n_jits = {}

        # _jit_* take variables positionally (for .lower()/cost analysis);
        # the _step/_init_bank wrappers bind self.variables and keep the
        # historical (state, frame, idx) call signature.
        self._jit_init_bank = _init_bank
        self._init_bank = lambda f, m: _init_bank(self.variables, f, m)
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

    def bootstrap(self, first_frame: np.ndarray, first_mask: np.ndarray,
                  ) -> FeatureBankState:
        """Seed the bank from frame 0 (frame [H,W,3] float01, mask [H,W]
        uint8 labels)."""
        small_hw = ops.short_side_size(*first_frame.shape[:2], self.downsample)
        first_frame = np.asarray(first_frame)
        self.full_hw = first_frame.shape[:2]
        if first_frame.dtype == np.uint8:
            first_frame = first_frame.astype(np.float32) / 255.0
        # device_put (async DMA) instead of jnp.asarray: asarray is a slow
        # synchronous copy through the host tunnel (~25x slower for 1080p).
        frame = jax.device_put(np.asarray(first_frame, np.float32))
        frame_small = ops.resize(frame, small_hw, "bicubic",
                                 spatial_axes=(0, 1))
        mask_oh = to_onehot(first_mask, self.fb.obj_n)
        # nearest_torch: the reference's first-mask downsize is a torch
        # tensor NEAREST resize (test_video_seg.py:89, floor indexing)
        mask_small = ops.resize(jax.device_put(mask_oh), small_hw,
                                "nearest_torch", spatial_axes=(-2, -1))
        k4, v4 = self._init_bank(frame_small, mask_small)
        return self.fb.init_bank(k4, v4)

    def upload(self, frame: np.ndarray) -> jnp.ndarray:
        """Async H2D of a frame as uint8 (call from a prefetch thread to
        overlap the transfer with device compute)."""
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = (frame * 255.0 + 0.5).astype(np.uint8)
        return jax.device_put(frame)

    def step(self, state: FeatureBankState, frame,
             frame_idx: int) -> Tuple[FeatureBankState, jnp.ndarray]:
        """Process one frame (uint8/float01 numpy, or an already-uploaded
        device array from :meth:`upload`). Returns (state, full-res uint8
        label map on device)."""
        if not isinstance(frame, jax.Array):
            frame = self.upload(frame)
        fn = (self._step if frame_idx % self.memorize_every == 0
              else self._step_ro)
        state, label, _ = fn(state, frame, jnp.float32(frame_idx))
        return state, label

    def step_n(self, state: FeatureBankState, frames,
               start_idx: int) -> Tuple[FeatureBankState, jnp.ndarray]:
        """Process K consecutive frames in ONE device dispatch.

        ``frames``: a [K, H, W, 3] array (uint8 device/host) or a list of
        frames / uploaded device arrays. Returns (state, labels) with labels
        stacked [K, ...] (bit-packed rows for binary masks — use
        :meth:`fetch_labels`). Frame ``i`` of the chunk gets frame index
        ``start_idx + i``; the bank is updated on every frame, so this is
        only available at ``memorize_every == 1`` (the reference contract).
        """
        if self.memorize_every != 1:
            raise ValueError("step_n requires memorize_every == 1")
        if isinstance(frames, (list, tuple)):
            if isinstance(frames[0], jax.Array):
                frames = jnp.stack(frames)
            else:
                frames = self.upload(np.stack(
                    [np.asarray(f) for f in frames]))
        elif not isinstance(frames, jax.Array):
            frames = self.upload(frames)
        k = int(frames.shape[0])
        fn = self._step_n_jits.get(k)
        if fn is None:
            fn = self._step_n_jits[k] = self._make_step_n(k)
        state, labels = fn(state, self.variables, frames,
                           jnp.float32(start_idx))
        return state, labels

    def fetch_label(self, label) -> np.ndarray:
        """Device label handle (possibly bit-packed) -> host uint8 [H, W]."""
        arr = np.asarray(jax.device_get(label))
        if self.fb.obj_n == 2 and self.full_hw is not None:
            arr = unpack_bits(arr, self.full_hw[1])
        return arr

    def fetch_labels(self, labels) -> np.ndarray:
        """Stacked :meth:`step_n` labels [K, ...] -> host uint8 [K, H, W]."""
        arr = np.asarray(jax.device_get(labels))
        if self.fb.obj_n == 2 and self.full_hw is not None:
            arr = np.stack([unpack_bits(a, self.full_hw[1]) for a in arr])
        return arr


def _decode(path: str) -> np.ndarray:
    return np.asarray(load_image(path), np.uint8)


def run_video_segmentation(test_path: str, test_name: str,
                           out_dir: str = "./output/segs",
                           model: Optional[AFBURR] = None,
                           variables=None,
                           budget: int = 250_000,
                           update_rate: float = 0.1,
                           merge_thres: float = 0.95,
                           downsample: int = 480,
                           viz: bool = True,
                           postprocess="auto",
                           image_model_path: Optional[str] = None,
                           first_mask_path: Optional[str] = None,
                           checkpoint_every: int = 0,
                           memorize_every: int = 1,
                           cc_scale: int = 16) -> dict:
    """End-to-end video segmentation over a frame directory.

    Mirrors the reference entry point behaviour (test_video_seg.py:41-123):
    output tree ``<out_dir>/<test_name>/{mask,overlay}``, first-frame mask
    auto-generated by the image model if missing.

    ``checkpoint_every`` > 0 enables long-video fault tolerance (new vs the
    reference, SURVEY.md §5): the bank state is checkpointed every K frames
    and an interrupted run resumes from the last checkpoint.
    """
    img_list = sorted(glob(os.path.join(test_path, "*.jpg"))
                      + glob(os.path.join(test_path, "*.png")))
    if not img_list:
        raise FileNotFoundError(f"no frames in {test_path}")

    mask_dir = os.path.join(out_dir, test_name, "mask")
    overlay_dir = os.path.join(out_dir, test_name, "overlay")
    os.makedirs(mask_dir, exist_ok=True)
    if viz:
        os.makedirs(overlay_dir, exist_ok=True)

    first_name = os.path.splitext(os.path.basename(img_list[0]))[0]
    if first_mask_path is None:
        first_mask_path = os.path.join(mask_dir, first_name + ".png")
    if not os.path.exists(first_mask_path):
        # Bootstrap with the image segmentation model (reference
        # test_video_seg.py:67-69).
        from .image_seg import run_image_segmentation
        run_image_segmentation(img_list[0], test_name, out_dir,
                               model_path=image_model_path)

    first_frame = _decode(img_list[0])
    first_mask = load_mask(first_mask_path)
    obj_n = int(first_mask.max()) + 1

    fb = FeatureBank(obj_n=obj_n, memory_budget=budget,
                     update_rate=update_rate, thres_close=merge_thres)
    state = None

    engine = VideoSegEngine(model, variables, fb, downsample=downsample,
                            postprocess=postprocess,
                            memorize_every=memorize_every,
                            cc_scale=cc_scale)
    state = engine.bootstrap(first_frame, first_mask)

    # Long-video fault tolerance: resume the bank from the last checkpoint.
    ckpt_dir = os.path.join(out_dir, test_name, "bank_ckpt")
    start_idx = 0
    if checkpoint_every > 0 and os.path.isdir(ckpt_dir):
        from ..core.checkpoint import restore_checkpoint
        try:
            blob = restore_checkpoint(ckpt_dir,
                                      target={"state": state, "idx": 0})
            state = blob["state"]
            start_idx = int(blob["idx"])
            print(gct(), f"resumed bank checkpoint at frame {start_idx}")
        except Exception as e:
            print(gct(), f"bank checkpoint unusable ({e}); starting fresh")

    # Save frame-0 outputs (identity mask, reference :91-97).
    save_seg_mask(first_mask, os.path.join(mask_dir, first_name + ".png"))
    if viz:
        save_overlay(first_frame, first_mask,
                     os.path.join(overlay_dir, first_name + ".png"))

    # Fully-overlapped streaming loop: decode+upload prefetch threads feed
    # the device; the device runs frame t while the label of frame t-1 is
    # read back asynchronously and written by the writer pool. The serial
    # critical path per frame is just the jitted step dispatch.
    fps = FrameSecondMeter()
    decode_pool = ThreadPoolExecutor(max_workers=2)
    writer_pool = ThreadPoolExecutor(max_workers=2)

    def _load(path):
        frame = _decode(path)
        return frame, engine.upload(frame)

    rest = img_list[1:]
    futures = {i: decode_pool.submit(_load, p) for i, p in enumerate(rest[:3])}

    def _write(name, label, frame):
        pred = engine.fetch_label(label)            # D2H inside the pool
        if engine.postprocess == "host":
            pred = host_largest_cc(pred)
        save_seg_mask(pred, os.path.join(mask_dir, name + ".png"))
        if viz:
            save_overlay(frame, pred,
                         os.path.join(overlay_dir, name + ".png"))

    pending = None   # (name, label_device, frame_host)
    writes = []
    for idx, path in enumerate(rest):
        frame_host, frame_dev = futures.pop(idx).result()
        if idx + 3 < len(rest):
            futures[idx + 3] = decode_pool.submit(_load, rest[idx + 3])
        if idx < start_idx:   # already processed before the resume point
            continue
        state, label = engine.step(state, frame_dev, idx + 1)
        if checkpoint_every > 0 and (idx + 1) % checkpoint_every == 0:
            from ..core.checkpoint import save_checkpoint
            save_checkpoint(ckpt_dir, {"state": state, "idx": idx + 1})
        label.copy_to_host_async()
        if pending is not None:
            pname, plabel, pframe = pending
            writes.append(writer_pool.submit(_write, pname, plabel, pframe))
        name = os.path.splitext(os.path.basename(path))[0]
        pending = (name, label, frame_host)
        fps.add_frame_n(1)

    if pending is not None:
        pname, plabel, pframe = pending
        _write(pname, plabel, pframe)
    for wfut in writes:
        wfut.result()
    fps.end()
    decode_pool.shutdown()
    writer_pool.shutdown()
    report = fb.report(state)
    print(gct(), report)
    print(gct(), f"throughput: {fps.fps:.3f} frames/s")
    return {"fps": fps.fps, "frames": fps.frame_n, "bank_report": report,
            "mask_dir": mask_dir}
