"""Bank-sharded merge/append/evict update (multi-chip video propagation).

Completes the context-parallel inference story started by
:mod:`.sharded_read`: with the feature bank's capacity axis sharded over the
mesh's ``model`` axis, one shard_map step performs the reference
FeatureBank.update semantics (FeatureBank.py:53-143) fully distributed:

1. each shard cosine-correlates the incoming HW features against ITS slots;
   the global best match per feature combines with ``pmax`` + a shard-id
   tie-break,
2. features matched above ``thres_close`` merge shard-locally (segmented
   group-mean EMA on the owning shard only),
3. append victims are chosen globally: every shard proposes its M cheapest
   slots (free first, then lowest LFU), candidates are ``all_gather``-ed and
   every shard runs the identical replicated top-M selection, then scatters
   the features assigned to its own slots.

All collectives ride ICI; per-shard work is O(n_local * M) matmul +
O(M) scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.bank_update import (_best_match_occ, _safe_normalize,
                               _sorted_group_means)
from .mesh import MODEL_AXIS
from .sharded_read import _shard_occ_bound


def sharded_bank_merge_append(mesh, keys, values, valid, birth, usage,
                              new_keys, new_values, frame_idx,
                              update_rate: float = 0.1,
                              thres_close: float = 0.95):
    """Distributed bank update. keys/values/valid/birth/usage sharded on the
    capacity axis over ``model``; new_keys/new_values [M, d] replicated.

    Returns updated (keys, values, valid, birth, usage, evicted_n) with the
    same shardings; ``evicted_n`` is a replicated i32 scalar counting
    previously-valid slots overwritten by appends (feeds the bank's
    replacement-ratio telemetry, reference FeatureBank.py:141).
    """
    m = new_keys.shape[0]
    n_total = keys.shape[0]
    fi = jnp.asarray(frame_idx, jnp.float32)

    def kernel(keys, values, valid, birth, usage, nk, nv):
        shard = jax.lax.axis_index(MODEL_AXIS)
        n_shards = jax.lax.axis_size(MODEL_AXIS)
        n_local = keys.shape[0]
        offset = shard * n_local

        normed_new_k, _ = _safe_normalize(nk)
        normed_new_v, _ = _safe_normalize(nv)
        # occupancy-bounded match: O(local occupancy) like the read
        # (sharded_read.py::_shard_occ_bound — exact bound, not an
        # invariant assumption)
        local_corr, local_idx = _best_match_occ(keys, valid, normed_new_k,
                                                _shard_occ_bound(valid))
        g_corr = jax.lax.pmax(local_corr, MODEL_AXIS)          # [M]
        is_best = local_corr >= g_corr - 1e-7
        my_rank = jnp.where(is_best, shard, n_shards)
        winner = jax.lax.pmin(my_rank, MODEL_AXIS)             # [M]
        i_win = winner == shard

        merge_mask = g_corr > thres_close
        local_merge = jnp.logical_and(merge_mask, i_win)

        # ---- shard-local merge -------------------------------------------
        (k_mean, v_mean), row_ok, row_slot = _sorted_group_means(
            (normed_new_k, normed_new_v), local_idx, local_merge)
        slot_g = jnp.clip(row_slot, 0, n_local - 1)
        old_k = keys[slot_g].astype(jnp.float32)
        old_v = values[slot_g].astype(jnp.float32)
        nk_old, mag_ko = _safe_normalize(old_k)
        nv_old, mag_vo = _safe_normalize(old_v)
        r = update_rate
        merged_k = mag_ko * ((1.0 - r) * nk_old + r * k_mean)
        merged_v = mag_vo * ((1.0 - r) * nv_old + r * v_mean)
        scat = jnp.where(row_ok, row_slot, n_local)
        keys = keys.at[scat].set(merged_k.astype(keys.dtype), mode="drop")
        values = values.at[scat].set(merged_v.astype(values.dtype),
                                     mode="drop")
        protected = jnp.zeros((n_local,), bool).at[scat].set(True,
                                                             mode="drop")

        # ---- global victim selection for appends -------------------------
        append_mask = jnp.logical_not(merge_mask)              # [M] replicated
        age = jnp.maximum(fi - birth, 1.0)
        lfu = usage / age
        prio = jnp.where(valid, lfu, -2.0)
        prio = jnp.where(protected, jnp.float32(1e30), prio)
        k_prop = min(m, n_local)
        cand_prio, cand_slot = jax.lax.top_k(-prio, k_prop)    # cheapest first
        cand_prio = -cand_prio                                 # [k_prop]
        cand_global = cand_slot + offset

        all_prio = jax.lax.all_gather(cand_prio, MODEL_AXIS).reshape(-1)
        all_slot = jax.lax.all_gather(cand_global, MODEL_AXIS).reshape(-1)
        # replicated global selection of the m cheapest candidates
        _, sel = jax.lax.top_k(-all_prio, m)
        victims = all_slot[sel]                                # [M] global ids

        rank = jnp.cumsum(append_mask.astype(jnp.int32)) - 1   # [M]
        rank = jnp.clip(rank, 0, m - 1)
        dest_global = jnp.where(append_mask, victims[rank], n_total)
        dest_local = dest_global - offset
        mine = jnp.logical_and(dest_local >= 0, dest_local < n_local)
        dest = jnp.where(jnp.logical_and(append_mask, mine), dest_local,
                         n_local)

        evicted_local = jnp.sum(jnp.where(
            jnp.logical_and(dest < n_local, append_mask),
            valid[jnp.clip(dest, 0, n_local - 1)], False).astype(jnp.int32))
        evicted_n = jax.lax.psum(evicted_local, MODEL_AXIS)   # replicated

        keys = keys.at[dest].set(nk.astype(keys.dtype), mode="drop")
        values = values.at[dest].set(nv.astype(values.dtype), mode="drop")
        birth = birth.at[dest].set(fi, mode="drop")
        usage = usage.at[dest].set(0.0, mode="drop")
        valid = valid.at[dest].set(True, mode="drop")
        usage = jnp.clip(usage, 0.0, 1e5)
        return keys, values, valid, birth, usage, evicted_n

    spec2d = P(MODEL_AXIS, None)
    spec1d = P(MODEL_AXIS)
    rep2d = P(None, None)
    fn = shard_map(kernel, mesh=mesh,
                   in_specs=(spec2d, spec2d, spec1d, spec1d, spec1d,
                             rep2d, rep2d),
                   out_specs=(spec2d, spec2d, spec1d, spec1d, spec1d, P()))
    return fn(keys, values, valid, birth, usage, new_keys, new_values)
