"""AFB-URR video segmentation network, TPU-native.

Same computation graph as the reference model (video_module/model/AFB_URR.py):
a ResNet-50 *memory* encoder over (frame, mask, inverse-mask), a ResNet-50
*query* encoder, 3x3-conv key/value heads (1024 -> 128 / 512), softmax
memory-read attention against the feature bank, and a two-stage decoder with
uncertainty-gated local refinement — but re-designed for XLA:

- NHWC layout, bf16-capable convs, frozen BN (the reference freezes BN in
  training too, train_video_seg.py:106).
- The memory read is :func:`vfloodnet_tpu.ops.bank_attention_read` — a
  chunked online-softmax over a fixed-capacity masked bank instead of a
  dynamically-growing tensor with CUDA-OOM CPU fallback (AFB_URR.py:147-157).
- The bank usage-count side effect (AFB_URR.py:161-174) is returned
  functionally and applied to the bank state by the caller.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

from ..ops import (bank_attention_read, calc_uncertainty, local_avg_pool,
                   local_max_pool, pad_divide_by, unpad)
from .resnet import FrozenBN, ResNet50Backbone, StemKernel

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)  # host constant: no device init at import
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_he = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, half-pixel centres (align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * w, c),
                            method="linear").astype(x.dtype)


class ResBlock(nn.Module):
    """Pre-activation residual block (reference AFB_URR.py:10-30)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_he, name="conv1")(nn.relu(x))
        r = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_he, name="conv2")(nn.relu(r))
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=_he, name="downsample")(x)
        return x + r


class Refine(nn.Module):
    """Skip-connection refinement with 2x upsample (AFB_URR.py:114-127).

    Split into :meth:`skip` (depends only on the skip features — identical
    across the per-object copies the decoder runs on) and :meth:`refine`
    (mixes in the per-object upstream map), so the caller can compute the
    skip-side convs ONCE per batch and broadcast — (obj_n-1)/obj_n of the
    convFS/ResFS work eliminated with an identical result and an unchanged
    parameter tree."""
    features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.convFS = nn.Conv(self.features, (3, 3), padding=1,
                              dtype=self.dtype, kernel_init=_he)
        self.ResFS = ResBlock(self.features, dtype=self.dtype)
        self.ResMM = ResBlock(self.features, dtype=self.dtype)

    def skip(self, f):
        return self.ResFS(self.convFS(f))

    def refine(self, s, pm):
        return self.ResMM(s + _upsample2(pm))

    def __call__(self, f, pm):
        return self.refine(self.skip(f), pm)


class EncoderM(nn.Module):
    """Memory encoder: frame + mask + inverse-mask stems (AFB_URR.py:33-63)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame, mask, mask_inv):
        # frame [N,H,W,3] in [0,1]; mask/mask_inv [N,H,W,1]
        f = (frame - IMAGENET_MEAN) / IMAGENET_STD
        # The reference's conv1(f) + conv1_m(m) + conv1_o(o) stem sum
        # (AFB_URR.py:55-56) is one conv over the channel-concatenated
        # input by linearity; StemConv fuses all three planes into a single
        # space-to-depth stem (param tree unchanged: conv1_m/kernel,
        # conv1_o/kernel still [7,7,1,64]).
        wm = StemKernel(1, 64, name="conv1_m")()
        wo = StemKernel(1, 64, name="conv1_o")()
        r4, _, _, r1 = ResNet50Backbone(dtype=self.dtype, name="backbone")(
            f.astype(self.dtype), extra_in=(mask, mask_inv),
            extra_kernels=(wm, wo))
        return r4, r1


class EncoderQ(nn.Module):
    """Query encoder (AFB_URR.py:66-93)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame):
        f = (frame - IMAGENET_MEAN) / IMAGENET_STD
        return ResNet50Backbone(dtype=self.dtype, name="backbone")(
            f.astype(self.dtype))


class _ConvParams(nn.Module):
    """Parameter-only holder matching ``nn.Conv``'s tree (``<name>/kernel``
    [kh,kw,I,O] + ``<name>/bias`` [O]) so a fused caller can concatenate
    sibling convs over the same input into one wider MXU contraction with
    the checkpoint layout unchanged (same idiom as resnet.StemKernel)."""
    features: int
    in_features: int
    ksize: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.ksize + (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class KeyValue(nn.Module):
    """3x3-conv key/value heads (AFB_URR.py:96-111). Returns flattened
    [N, P, d] with P = h*w.

    The key (1024->128) and value (1024->512) convs share their input; the
    default path folds them into ONE 1024->640 conv (kernels concatenated
    along the output axis — bitwise-identical math, wider MXU tiles for the
    128-channel head). ``VFLOOD_KV_FUSED=0`` restores the two-conv lowering
    for within-session A/B (round-4 doctrine: cross-session relay swings
    make any other comparison untrustworthy)."""
    keydim: int = 128
    valdim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if os.environ.get("VFLOOD_KV_FUSED", "1") == "1":
            kk, kb = _ConvParams(self.keydim, c, name="key")()
            vk, vb = _ConvParams(self.valdim, c, name="value")()
            w_ = jnp.concatenate([kk, vk], axis=-1).astype(self.dtype)
            b_ = jnp.concatenate([kb, vb]).astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w_, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_
            key, val = out[..., :self.keydim], out[..., self.keydim:]
        else:
            key = nn.Conv(self.keydim, (3, 3), padding=1, dtype=self.dtype,
                          name="key")(x)
            val = nn.Conv(self.valdim, (3, 3), padding=1, dtype=self.dtype,
                          name="value")(x)
        return key.reshape(n, h * w, self.keydim), val.reshape(n, h * w, self.valdim)


class Decoder(nn.Module):
    """Global decode + uncertainty-gated local refinement (AFB_URR.py:181-239).

    Input: per-(batch*object) matched features at 1/16, skips r3 (1/8), r2
    (1/4), r1 (1/2). Output: per-object foreground probability at full
    resolution, shape [B, obj_n, H, W].
    """
    mdim_global: int = 256
    mdim_local: int = 32
    local_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patch_match, r3, r2, r1, bs: int, obj_n: int):
        """patch_match [bs*obj_n, h16, w16, C]; skips r3/r2/r1 are PER-BATCH
        [bs, ...] — their skip-side convs are object-independent, so they run
        once per batch and broadcast to the bs*obj_n object copies."""
        def per_obj(x):
            return jnp.repeat(x[:, None], obj_n, axis=1).reshape(
                (bs * obj_n,) + x.shape[1:])

        p = nn.Conv(self.mdim_global, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_he, name="convFM")(patch_match)
        p = ResBlock(self.mdim_global, dtype=self.dtype, name="ResMM")(p)
        rf3 = Refine(self.mdim_global, dtype=self.dtype, name="RF3")
        rf2 = Refine(self.mdim_global, dtype=self.dtype, name="RF2")
        p = rf3.refine(per_obj(rf3.skip(r3)), p)                             # 1/8
        p = rf2.refine(per_obj(rf2.skip(r2)), p)                             # 1/4
        r1 = per_obj(r1)
        p = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, kernel_init=_he,
                    name="pred2")(nn.relu(p))
        p = _upsample2(p)                                                    # 1/2

        n, h, w, _ = p.shape
        rough = jax.nn.softmax(p.astype(jnp.float32), axis=-1)[..., 1]      # [N,h,w]
        rough = rough.reshape(bs, obj_n, h, w)
        rough = jax.nn.softmax(rough, axis=1)          # object-level norm

        unc = calc_uncertainty(jnp.moveaxis(rough, 1, -1), obj_axis=-1)     # [B,h,w,1]
        unc = jnp.repeat(unc[:, None], obj_n, axis=1).reshape(n, h, w, 1)

        rough = rough.reshape(n, h, w, 1).astype(self.dtype)
        r1_weighted = r1 * rough
        r1_local = local_avg_pool(r1_weighted, self.local_size)
        r1_local = r1_local / (local_avg_pool(rough, self.local_size) + 1e-8)
        r1_conf = local_max_pool(rough, self.local_size)

        local_match = jnp.concatenate([r1, r1_local], axis=-1)
        q = nn.Conv(self.mdim_local, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_he, name="local_convFM")(local_match)
        q = ResBlock(self.mdim_local, dtype=self.dtype, name="local_ResMM")(q)
        q = r1_conf * nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                              kernel_init=_he, name="local_pred2")(nn.relu(q))

        p = p + unc.astype(self.dtype) * q
        p = _upsample2(p)                                                    # 1/1
        # Per-object fg LOG-ODDS: for a 2-class softmax,
        # log(p1 / (1 - p1)) == logit1 - logit0 EXACTLY — computing it this
        # way (instead of softmax -> clip -> log) is clip-free and keeps
        # gradients alive everywhere. With the clipped form, training from
        # scratch saturates past the 1e-7 clip within a few steps and the
        # zero-gradient clip pins the whole network at the base-rate fixed
        # point (loss = ln2 + 0.5, measured).
        p = p.astype(jnp.float32)
        score = p[..., 1] - p[..., 0]                                       # [N,H,W]
        return score.reshape(bs, obj_n, 2 * h, 2 * w)


class AFBURR(nn.Module):
    """Full AFB-URR graph. Use via ``apply(..., method=...)``:

    - ``memorize(frame [H,W,3], mask [obj_n,H,W])`` -> (k4, v4) each
      [obj_n, P, d].
    - ``segment(frames [B,H,W,3], bank_keys [obj,N,dk], bank_values
      [obj,N,dv], bank_valid [obj,N], training)`` -> (score logits
      [B, obj_n, H, W], uncertainty-loss scalar or None, usage counts
      [obj, N]).
    """
    keydim: int = 128
    valdim: int = 512
    read_chunk: int = 4096
    read_impl: str = "auto"   # bank_attention_read impl selector
    thres_valid: float = 1e-3
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_m = EncoderM(dtype=self.dtype)
        self.encoder_q = EncoderQ(dtype=self.dtype)
        self.keyval_r4 = KeyValue(self.keydim, self.valdim, dtype=self.dtype)
        self.decoder = Decoder(dtype=self.dtype)

    def init_all(self, frame: jnp.ndarray, mask: jnp.ndarray, bank_n: int = 128):
        """Touches every submodule so ``model.init(..., method=model.init_all)``
        creates the complete parameter tree."""
        obj_n = mask.shape[0]
        k4, v4 = self.memorize(frame, mask)
        keys = jnp.zeros((obj_n, bank_n, self.keydim))
        values = jnp.zeros((obj_n, bank_n, self.valdim))
        valid = jnp.zeros((obj_n, bank_n), bool).at[:, :8].set(True)
        return self.segment(frame[None], keys, values, valid, False)

    def memorize(self, frame: jnp.ndarray, mask: jnp.ndarray):
        obj_n = mask.shape[0]
        frame, _ = pad_divide_by(frame[None], 16)
        mask, _ = pad_divide_by(mask[..., None], 16, spatial_axes=(-3, -2))
        frames = jnp.broadcast_to(frame, (obj_n,) + frame.shape[1:])
        mask = mask.astype(self.dtype)
        mask_inv = jnp.clip(1.0 - mask, 0.0, 1.0)
        r4, _ = self.encoder_m(frames, mask, mask_inv)
        k4, v4 = self.keyval_r4(r4)
        return k4, v4

    def encode_query(self, frames: jnp.ndarray):
        """Query-side encode: frames [B,H,W,3] -> (k4 [B,P,dk], v4 [B,P,dv],
        skips (r3, r2, r1), h16w16, pad). First half of :meth:`segment`,
        exposed so a distributed engine can run the memory read externally
        (e.g. bank-sharded over a mesh)."""
        frames, pad = pad_divide_by(frames, 16)
        r4, r3, r2, r1 = self.encoder_q(frames)
        _, h16, w16, _ = r4.shape
        k4, v4 = self.keyval_r4(r4)
        return k4, v4, (r3, r2, r1), (h16, w16), pad

    def decode_with_memory(self, mem: jnp.ndarray, v4: jnp.ndarray,
                           skips, hw16, pad, training: bool = False):
        """Second half of :meth:`segment`: mem [B, obj, P, dv] from the
        bank read -> (score logits, uncertainty loss)."""
        r3, r2, r1 = skips
        h16, w16 = hw16
        bs, obj_n = mem.shape[:2]

        q_val = jnp.broadcast_to(v4[:, None], (bs, obj_n) + v4.shape[1:])
        feat = jnp.concatenate([mem.astype(self.dtype), q_val], axis=-1)
        feat = feat.reshape(bs * obj_n, h16, w16, 2 * self.valdim)

        # skips stay per-batch: the decoder runs their object-independent
        # convs once and broadcasts (see Decoder docstring).
        score = self.decoder(feat, r3, r2, r1,
                             bs, obj_n)                  # [B, obj, H, W] log-odds

        if training:
            unc = calc_uncertainty(jnp.moveaxis(
                jax.nn.softmax(score, axis=1), 1, -1), obj_axis=-1)
            hw = score.shape[-2] * score.shape[-1]
            # eps-guarded norm: jnp.linalg.norm has a NaN gradient at the
            # exactly-zero vector (x/||x||), which a fully-confident
            # prediction map produces — and 0.5 * NaN poisons the whole
            # gradient tree.
            unc = jnp.sqrt(jnp.sum(jnp.square(unc.reshape(bs, -1)), axis=1)
                           + 1e-12) / math.sqrt(hw)
            uncertainty_loss = jnp.mean(unc)
        else:
            uncertainty_loss = None

        score = unpad(score, pad, spatial_axes=(-2, -1))
        return score, uncertainty_loss

    def segment(self, frames: jnp.ndarray, bank_keys: jnp.ndarray,
                bank_values: jnp.ndarray, bank_valid: jnp.ndarray,
                training: bool = False, bank_occ=None):
        """``bank_occ`` (optional [obj_n] i32): occupancy under the bank's
        dense-prefix invariant — bounds the memory read at O(occupancy)."""
        k4, v4, skips, hw16, pad = self.encode_query(frames)
        occ_bound = None if bank_occ is None else jnp.max(bank_occ)

        def read_one(keys, values, valid, q):
            return bank_attention_read(keys, values, valid,
                                       q.astype(jnp.float32),
                                       thres=self.thres_valid,
                                       chunk=self.read_chunk,
                                       impl=self.read_impl,
                                       occ_bound=occ_bound)

        # vmap over objects, then over batch queries.
        read_obj = jax.vmap(read_one, in_axes=(0, 0, 0, None))     # over obj
        read = jax.vmap(read_obj, in_axes=(None, None, None, 0))   # over batch
        mem, cnt = read(bank_keys, bank_values, bank_valid, k4)
        # mem [B, obj, P, dv]; cnt [B, obj, N] -> sum batch contributions.
        usage_cnt = jnp.sum(cnt, axis=0)

        score, uncertainty_loss = self.decode_with_memory(
            mem, v4, skips, hw16, pad, training)
        return score, uncertainty_loss, usage_cnt
