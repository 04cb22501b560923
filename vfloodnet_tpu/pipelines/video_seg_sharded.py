"""Multi-chip video propagation: the feature bank sharded across the mesh.

Combines the distributed bank read (parallel/sharded_read.py) and update
(parallel/sharded_update.py) with the AFB-URR encode/decode halves
(models/afb_urr.py encode_query / decode_with_memory) into a per-frame engine
whose bank capacity scales with the number of chips — the sequence/context
parallelism story for unbounded video length (SURVEY.md §2.4).

The encoders/decoder run replicated (they are small per frame); the O(N)
work — attention read, cosine match, merge/evict — is sharded over the
``model`` axis and combined with ICI collectives.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..memory import FeatureBank, FeatureBankState
from ..models import AFBURR
from ..parallel import (shard_bank_state, sharded_bank_attention_read,
                        sharded_bank_merge_append)
from .video_seg import to_onehot


class ShardedVideoSegEngine:
    """Per-frame propagation with the bank sharded over mesh axis 'model'."""

    def __init__(self, model: AFBURR, variables, fb: FeatureBank, mesh,
                 downsample: int = 480):
        self.model = model
        if model.dtype != jnp.float32:     # see cast_floating_params
            from .loaders import cast_floating_params
            variables = cast_floating_params(variables, model.dtype)
        self.variables = variables
        self.fb = fb
        self.mesh = mesh
        self.downsample = downsample

        self._encode = jax.jit(lambda f: model.apply(
            variables, f, method=model.encode_query))
        self._decode = jax.jit(lambda mem, v4, skips, hw16, pad: model.apply(
            variables, mem, v4, skips, hw16, pad, False,
            method=model.decode_with_memory),
            static_argnums=(3, 4))
        self._memorize = jax.jit(lambda f, m: model.apply(
            variables, f, m, method=model.memorize))

    def bootstrap(self, first_frame: np.ndarray,
                  first_mask: np.ndarray) -> FeatureBankState:
        first_frame = np.asarray(first_frame)
        if first_frame.dtype == np.uint8:
            first_frame = first_frame.astype(np.float32) / 255.0
        small_hw = ops.short_side_size(*first_frame.shape[:2],
                                       self.downsample)
        frame = ops.resize(jax.device_put(first_frame), small_hw, "bicubic",
                           spatial_axes=(0, 1))
        mask = ops.resize(jax.device_put(to_onehot(first_mask,
                                                   self.fb.obj_n)),
                          small_hw, "nearest", spatial_axes=(-2, -1))
        k4, v4 = self._memorize(frame, mask)
        state = self.fb.init_bank(k4, v4)
        return shard_bank_state(self.mesh, state)

    def step(self, state: FeatureBankState, frame: np.ndarray,
             frame_idx: int) -> Tuple[FeatureBankState, jnp.ndarray]:
        frame = np.asarray(frame)
        if frame.dtype == np.uint8:
            frame = frame.astype(np.float32) / 255.0
        small_hw = ops.short_side_size(*frame.shape[:2], self.downsample)
        frame_small = ops.resize(jax.device_put(frame), small_hw, "bicubic",
                                 spatial_axes=(0, 1))

        k4, v4, skips, _, _ = self._encode(frame_small[None])
        # static shape metadata recomputed host-side (the jitted encode
        # returns traced values, but these drive static decode shapes)
        from ..ops.pad import pad_amounts
        top, bottom, left, right = pad_amounts(*small_hw, 16)
        hw16 = ((small_hw[0] + top + bottom) // 16,
                (small_hw[1] + left + right) // 16)
        pad = (top, bottom, left, right)

        mems, cnts = [], []
        q = k4[0].astype(jnp.float32)
        for o in range(self.fb.obj_n):        # static loop; obj_n is 2-3
            mem_o, cnt_o = sharded_bank_attention_read(
                self.mesh, state.keys[o], state.values[o], state.valid[o],
                q, thres=self.model.thres_valid)
            mems.append(mem_o)
            cnts.append(cnt_o)
        mem = jnp.stack(mems)[None]           # [1, obj, P, dv]
        cnt = jnp.stack(cnts)                 # [obj, N] (sharded)

        score, _ = self._decode(mem, v4, skips, hw16, pad)
        pred = jax.nn.softmax(score, axis=1)  # [1, obj, h, w]

        nk, nv = self._memorize(frame_small, pred[0])

        usage = state.usage + jnp.log1p(cnt)
        usage = jnp.where(state.valid, jnp.clip(usage, 0.0, 1e5), 0.0)
        state = state.replace(usage=usage)

        new_cols = []
        for o in range(self.fb.obj_n):
            ks, vs, ok, bi, us = sharded_bank_merge_append(
                self.mesh, state.keys[o], state.values[o], state.valid[o],
                state.birth[o], state.usage[o], nk[o], nv[o],
                float(frame_idx), update_rate=self.fb.update_rate,
                thres_close=self.fb.thres_close)
            new_cols.append((ks, vs, ok, bi, us))
        state = state.replace(
            keys=jnp.stack([c[0] for c in new_cols]),
            values=jnp.stack([c[1] for c in new_cols]),
            valid=jnp.stack([c[2] for c in new_cols]),
            birth=jnp.stack([c[3] for c in new_cols]),
            usage=jnp.stack([c[4] for c in new_cols]),
        )
        label = jnp.argmax(pred[0], axis=0).astype(jnp.uint8)
        return state, label
