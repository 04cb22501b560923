"""Adaptive Feature Bank as a fixed-capacity functional state.

TPU-native redesign of the reference FeatureBank
(video_module/model/FeatureBank.py): instead of per-object python lists of
dynamically-growing tensors, the bank is one pytree of pre-allocated
[obj_n, capacity, d] arrays plus masks, so every operation is a jitted
static-shape update (no recompiles, no re-allocation, shardable across a
device mesh along the capacity axis).

Budget semantics mirror the reference (FeatureBank.py:20-22): per-class
budget = memory_budget // obj_n, scaled by 0.8 when obj_n == 2; here it is
additionally rounded up to a multiple of 128 for TPU lane alignment — and,
for banks larger than one occ-chunk, rounded DOWN to a multiple of the
occupancy-bounded loop chunk (ops OCC_CHUNK, never above the user's memory
budget), which makes every chunk-loop pad of the big key/value arrays a
no-op (a non-multiple capacity costs an O(capacity) pad copy per
read/update).

Telemetry (peak utilisation / replacement ratio, FeatureBank.py:145-149) is
carried in the state and printable via :meth:`FeatureBank.report`.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.bank_update import OCC_CHUNK, bank_merge_append


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@flax.struct.dataclass
class FeatureBankState:
    keys: jnp.ndarray      # [obj_n, cap, dk]
    values: jnp.ndarray    # [obj_n, cap, dv]
    valid: jnp.ndarray     # [obj_n, cap] bool
    birth: jnp.ndarray     # [obj_n, cap] f32 — frame idx the slot was written
    usage: jnp.ndarray     # [obj_n, cap] f32 — accumulated log usage
    peak_n: jnp.ndarray    # [obj_n] i32 — max occupied slots seen
    replace_n: jnp.ndarray # [obj_n] i32 — total evictions
    # [obj_n] i32 — occupancy under the dense-prefix invariant (all valid
    # slots live in [0, occ)); bounds the per-frame read/match work at
    # O(occupancy) like the reference's growing bank (FeatureBank.py:106-110).
    occ: jnp.ndarray

    @property
    def obj_n(self) -> int:
        return self.keys.shape[0]

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=1)


class FeatureBank:
    """Factory + jitted transition functions for :class:`FeatureBankState`."""

    def __init__(self, obj_n: int, memory_budget: int = 250_000,
                 update_rate: float = 0.1, thres_close: float = 0.95,
                 keydim: int = 128, valdim: int = 512,
                 dtype: jnp.dtype = jnp.float32):
        self.obj_n = obj_n
        class_budget = memory_budget // obj_n
        if obj_n == 2:
            class_budget = int(0.8 * class_budget)
        self.class_budget = _round_up(max(class_budget, 128), 128)
        if self.class_budget > OCC_CHUNK:
            # Align capacity to the occ-loop chunk so chunk pads become
            # no-ops — rounding DOWN (never above the user's memory budget;
            # at most 8191 slots stricter than the reference's exact budget).
            self.class_budget = max(OCC_CHUNK,
                                    (self.class_budget // OCC_CHUNK)
                                    * OCC_CHUNK)
        self.update_rate = update_rate
        self.thres_close = thres_close
        self.keydim = keydim
        self.valdim = valdim
        self.dtype = dtype

    def empty(self) -> FeatureBankState:
        cap = self.class_budget
        return FeatureBankState(
            keys=jnp.zeros((self.obj_n, cap, self.keydim), self.dtype),
            values=jnp.zeros((self.obj_n, cap, self.valdim), self.dtype),
            valid=jnp.zeros((self.obj_n, cap), bool),
            birth=jnp.zeros((self.obj_n, cap), jnp.float32),
            usage=jnp.zeros((self.obj_n, cap), jnp.float32),
            peak_n=jnp.zeros((self.obj_n,), jnp.int32),
            replace_n=jnp.zeros((self.obj_n,), jnp.int32),
            occ=jnp.zeros((self.obj_n,), jnp.int32),
        )

    def init_bank(self, keys: jnp.ndarray, values: jnp.ndarray,
                  frame_idx: float = 0.0) -> FeatureBankState:
        """Seed the bank with first-frame features (FeatureBank.py:27-36).

        keys [obj_n, P, dk], values [obj_n, P, dv] with P <= capacity.
        """
        state = self.empty()
        p = keys.shape[1]
        if p > self.class_budget:
            raise ValueError(f"first-frame features ({p}) exceed per-class "
                             f"budget ({self.class_budget})")
        valid = state.valid.at[:, :p].set(True)
        return state.replace(
            keys=state.keys.at[:, :p].set(keys.astype(self.dtype)),
            values=state.values.at[:, :p].set(values.astype(self.dtype)),
            valid=valid,
            birth=state.birth.at[:, :p].set(frame_idx),
            peak_n=jnp.full((self.obj_n,), p, jnp.int32),
            occ=jnp.full((self.obj_n,), p, jnp.int32),
        )

    def append(self, state: FeatureBankState, keys: jnp.ndarray,
               values: jnp.ndarray, frame_idx: float = 0.0
               ) -> FeatureBankState:
        """Unconditional insert of extra frame features (reference
        FeatureBank.append, :38-51: concatenates with usage bootstrapped to
        20). The features extend the dense prefix (the reference's torch.cat
        growth), overwriting lowest-LFU valid slots only when full."""
        fi = jnp.asarray(frame_idx, jnp.float32)

        def one(bkeys, bvalues, valid, birth, usage, occ, nk, nv):
            n = bkeys.shape[0]
            m = nk.shape[0]
            k = min(m, n)
            age = jnp.maximum(fi - birth, 1.0)
            prio = jnp.where(valid, usage / age, jnp.float32(1e30))
            _, victim_order = jax.lax.top_k(-prio, k)
            rank = jnp.arange(m, dtype=jnp.int32)
            free_n = jnp.int32(n) - occ
            victim = victim_order[jnp.clip(rank - free_n, 0, k - 1)]
            victim = jnp.where(prio[victim] < 1e30, victim, jnp.int32(n))
            d = jnp.where(rank < free_n, occ + rank, victim)
            bkeys = bkeys.at[d].set(nk.astype(self.dtype), mode="drop")
            bvalues = bvalues.at[d].set(nv.astype(self.dtype), mode="drop")
            birth = birth.at[d].set(fi, mode="drop")
            usage = usage.at[d].set(20.0, mode="drop")  # FeatureBank.py:46
            valid = valid.at[d].set(True, mode="drop")
            occ = jnp.minimum(occ + jnp.int32(m), jnp.int32(n))
            return bkeys, bvalues, valid, birth, usage, occ

        keys_, values_, valid_, birth_, usage_, occ_ = jax.vmap(one)(
            state.keys, state.values, state.valid, state.birth, state.usage,
            state.occ, keys.astype(self.dtype), values.astype(self.dtype))
        return state.replace(keys=keys_, values=values_, valid=valid_,
                             birth=birth_, usage=usage_, occ=occ_,
                             peak_n=jnp.maximum(state.peak_n, occ_))

    def record_usage(self, state: FeatureBankState,
                     usage_cnt: jnp.ndarray) -> FeatureBankState:
        """Apply the attention-read usage counts (reference AFB_URR.py:174:
        ``info[:, 1] += log(cnt + 1)``)."""
        usage = state.usage + jnp.log1p(usage_cnt)
        usage = jnp.where(state.valid, jnp.clip(usage, 0.0, 1e5), 0.0)
        return state.replace(usage=usage)

    def update(self, state: FeatureBankState, new_keys: jnp.ndarray,
               new_values: jnp.ndarray, frame_idx) -> FeatureBankState:
        """Merge/append/evict one frame of features (FeatureBank.py:53-115).

        new_keys [obj_n, P, dk], new_values [obj_n, P, dv].
        """
        fi = jnp.asarray(frame_idx, jnp.float32)
        # Shared work bound for the cosine match (unbatched under vmap so the
        # chunk loop keeps a single trip count).
        occ_bound = jnp.max(state.occ)

        def one(keys, values, valid, birth, usage, occ, nk, nv):
            return bank_merge_append(keys, values, valid, birth, usage, nk,
                                     nv, fi, update_rate=self.update_rate,
                                     thres_close=self.thres_close,
                                     occ=occ, occ_bound=occ_bound)

        keys, values, valid, birth, usage, occ, stats = jax.vmap(
            one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
            state.keys, state.values, state.valid, state.birth, state.usage,
            state.occ, new_keys.astype(self.dtype),
            new_values.astype(self.dtype))

        return FeatureBankState(
            keys=keys, values=values, valid=valid, birth=birth, usage=usage,
            peak_n=jnp.maximum(state.peak_n, occ),
            replace_n=state.replace_n + stats.evicted_n,
            occ=occ,
        )

    def report(self, state: FeatureBankState) -> str:
        """Bank health telemetry (reference FeatureBank.print_peak_mem)."""
        ur = jax.device_get(state.peak_n) / self.class_budget
        rr = jax.device_get(state.replace_n) / self.class_budget
        return (f"Obj num: {self.obj_n}. Budget / obj: {self.class_budget}. "
                f"UR: {ur}. Replace: {rr}.")
