"""Fixed-capacity feature-bank update: cosine match -> merge / append / evict.

TPU-native redesign of the reference FeatureBank.update/remove
(video_module/model/FeatureBank.py:53-143). The reference bank grows and
shrinks dynamically (torch.cat / boolean indexing / torch_scatter), forcing
re-allocation every frame and making the shapes dynamic. Here the bank is a
pre-allocated [N] slot array with a validity mask, and one jitted update does:

1. cosine-correlate the HW new features against all valid slots (chunked
   matmul scan, no [M, N] materialisation),
2. features whose best correlation exceeds ``thres_close`` are *merged* into
   their matched slot via a masked segment-mean (replacing torch_scatter's
   ``scatter_mean``) with EMA rate ``update_rate``,
3. the rest are *appended*: destination slots are chosen by a single argsort
   of replacement priority — free slots first, then lowest LFU score
   (usage / age), mirroring the reference's LFU eviction. Occupied victims
   are simply overwritten, so append+evict is one static-shape scatter.

All shapes static -> zero recompiles over a whole video.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class BankUpdateStats(NamedTuple):
    merged_n: jnp.ndarray    # features merged into existing slots
    appended_n: jnp.ndarray  # features written to new slots
    evicted_n: jnp.ndarray   # previously-valid slots overwritten


def _safe_normalize(x: jnp.ndarray, axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mag = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(mag, 1e-12), mag


def _best_match(bank_keys: jnp.ndarray, bank_mag: jnp.ndarray,
                valid: jnp.ndarray, normed_new: jnp.ndarray,
                chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Running argmax of cosine correlation, chunked over the bank axis.

    Bank keys are passed *unnormalised* with their per-slot magnitudes
    (``bank_mag`` [N]) so the full normalised bank never materialises:
    cosine = (new_normed . key) / |key|.

    bank_keys [N, d], valid [N], normed_new [M, d] -> (best_corr [M],
    best_idx [M]).
    """
    n, d = bank_keys.shape
    m = normed_new.shape[0]
    inv_mag = jnp.where(valid, 1.0 / jnp.maximum(bank_mag, 1e-12), 0.0)
    mm_dtype = bank_keys.dtype
    new_mm = normed_new.astype(mm_dtype)

    if n * m <= 256 * 1024 * 1024:
        # dense one-shot: one big MXU matmul beats a serialised chunk scan.
        # For bf16 banks the [M, N] correlation intermediate stays bf16
        # (the match is HBM-bound; cosine error ~4e-3 around the 0.95 merge
        # threshold only flips borderline merge-vs-append decisions of
        # near-duplicate features — within bf16 production tolerance).
        big_dtype = mm_dtype if mm_dtype == jnp.bfloat16 else jnp.float32
        corr = jax.lax.dot(new_mm, bank_keys.T,
                           preferred_element_type=big_dtype)     # [M, N]
        corr = corr * inv_mag[None, :].astype(big_dtype)
        corr = jnp.where(valid[None, :], corr, jnp.asarray(-2.0, big_dtype))
        best_idx = jnp.argmax(corr, axis=1).astype(jnp.int32)
        best_corr = jnp.take_along_axis(
            corr, best_idx[:, None], axis=1)[:, 0].astype(jnp.float32)
        return best_corr, best_idx

    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    bank_c = jnp.pad(bank_keys, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    valid_c = jnp.pad(valid, (0, pad)).reshape(n_chunks, chunk)
    inv_c = jnp.pad(inv_mag, (0, pad)).reshape(n_chunks, chunk)

    def step(carry, inp):
        best_corr, best_idx = carry
        (k_c, ok, im), ci = inp
        corr = jax.lax.dot(new_mm, k_c.T,
                           preferred_element_type=jnp.float32)  # [M, chunk]
        corr = corr * im[None, :]
        corr = jnp.where(ok[None, :], corr, -2.0)
        local_best = jnp.argmax(corr, axis=1)
        local_val = jnp.take_along_axis(corr, local_best[:, None], axis=1)[:, 0]
        better = local_val > best_corr
        best_idx = jnp.where(better, ci * chunk + local_best, best_idx)
        best_corr = jnp.maximum(best_corr, local_val)
        return (best_corr, best_idx), None

    init = (jnp.full((m,), -2.0, jnp.float32), jnp.zeros((m,), jnp.int32))
    (best_corr, best_idx), _ = jax.lax.scan(
        step, init, ((bank_c, valid_c, inv_c),
                     jnp.arange(n_chunks, dtype=jnp.int32)))
    return best_corr, best_idx


# Occupancy-bounded loop chunk (see ops/attention.py OCC_CHUNK).
OCC_CHUNK = 8192


def _best_match_occ(bank_keys: jnp.ndarray,
                    valid: jnp.ndarray, normed_new: jnp.ndarray,
                    occ_bound: jnp.ndarray,
                    chunk: int = OCC_CHUNK) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Occupancy-bounded running argmax: only the first
    ``ceil(occ_bound / chunk)`` bank chunks are correlated (traced trip
    count). Exact as long as no valid slot lies at index >= occ_bound (the
    dense-prefix invariant); the in-chunk valid mask handles the rest.

    Slot magnitudes are computed per visited chunk inside the loop (not
    precomputed over the whole bank): keeps the update O(occupancy) with no
    O(capacity) norm pass, and the pads below are no-ops when the bank
    capacity is a multiple of ``chunk`` (FeatureBank rounds it up so).

    For bf16 banks the [M, chunk] correlation intermediate stays bf16 (same
    HBM-traffic trade as the dense ``_best_match`` above)."""
    n, d = bank_keys.shape
    m = normed_new.shape[0]
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    keys_p = jnp.pad(bank_keys, ((0, pad), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    mm_dtype = bank_keys.dtype
    big_dtype = mm_dtype if mm_dtype == jnp.bfloat16 else jnp.float32
    new_mm = normed_new.astype(mm_dtype)
    n_iter = jnp.clip((occ_bound + chunk - 1) // chunk, 1, n_chunks)

    def body(i, carry):
        best_corr, best_idx = carry
        start = i * chunk
        k_c = jax.lax.dynamic_slice(keys_p, (start, 0), (chunk, d))
        ok = jax.lax.dynamic_slice(valid_p, (start,), (chunk,))
        mag = jnp.linalg.norm(k_c.astype(jnp.float32), axis=1)
        im = jnp.where(ok, 1.0 / jnp.maximum(mag, 1e-12), 0.0)
        corr = jax.lax.dot(new_mm, k_c.T,
                           preferred_element_type=big_dtype)     # [M, chunk]
        corr = jnp.where(ok[None, :], corr * im[None, :].astype(big_dtype),
                         jnp.asarray(-2.0, big_dtype))
        local_best = jnp.argmax(corr, axis=1)
        local_val = jnp.take_along_axis(corr, local_best[:, None],
                                        axis=1)[:, 0].astype(jnp.float32)
        better = local_val > best_corr
        best_idx = jnp.where(better,
                             start + local_best.astype(jnp.int32), best_idx)
        return jnp.maximum(best_corr, local_val), best_idx

    # The loop carry inherits ``occ_bound``'s device-varying type (no-op
    # arithmetic): under shard_map (parallel/sharded_update.py) the trip
    # bound varies per shard and while_loop requires a matching varying
    # carry; outside shard_map this is the identity.
    zero = jnp.zeros((), jnp.int32) + 0 * jnp.asarray(occ_bound, jnp.int32)
    init = (zero,
            jnp.full((m,), -2.0, jnp.float32) + zero.astype(jnp.float32),
            jnp.zeros((m,), jnp.int32) + zero)
    _, best_corr, best_idx = jax.lax.while_loop(
        lambda c: c[0] < n_iter,
        lambda c: (c[0] + 1,) + body(c[0], (c[1], c[2])), init)
    return best_corr, best_idx


def _sorted_group_means(datas, idx: jnp.ndarray, mask: jnp.ndarray):
    """Group-means over the M *incoming* features only (no bank-sized
    temporaries): sort rows by target slot, segmented suffix-sum within
    equal-slot runs, keep each run's total at its first row.

    datas: tuple of [M, d_i] arrays sharing idx/mask. Returns
    (means: tuple of [M, d_i], row_ok [M] bool, row_slot [M] — slot id at
    run-first rows, 2**30 elsewhere).
    """
    m = idx.shape[0]
    big = jnp.where(mask, idx, jnp.int32(2**30))
    order = jnp.argsort(big)
    s_idx = big[order]

    same_as_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), s_idx[1:] == s_idx[:-1]])

    # Standard forward segmented prefix-sum over the REVERSED rows: a run's
    # first row (original order) is its last row reversed, so the prefix
    # there covers the whole run.
    s_idx_r = s_idx[::-1]
    head_r = jnp.concatenate(
        [jnp.ones((1,), bool), s_idx_r[1:] != s_idx_r[:-1]])

    def seg_combine(a, b):
        av, ac, ah = a
        bv, bc, bh = b
        v = jnp.where(bh[:, None], bv, av + bv)
        c = jnp.where(bh, bc, ac + bc)
        return v, c, jnp.logical_or(ah, bh)

    means = []
    counts = None
    for data in datas:
        s_data_r = data.astype(jnp.float32)[order][::-1]
        totals_r, counts_r, _ = jax.lax.associative_scan(
            seg_combine, (s_data_r, jnp.ones((m,), jnp.float32), head_r))
        totals = totals_r[::-1]
        counts = counts_r[::-1]
        means.append(totals / jnp.maximum(counts[:, None], 1.0))
    run_first = jnp.logical_not(same_as_prev)
    valid_row = jnp.logical_and(run_first, s_idx < 2**30)
    row_slot = jnp.where(valid_row, s_idx, jnp.int32(2**30))
    return tuple(means), valid_row, row_slot


def bank_merge_append(keys: jnp.ndarray, values: jnp.ndarray, valid: jnp.ndarray,
                      birth: jnp.ndarray, usage: jnp.ndarray,
                      new_keys: jnp.ndarray, new_values: jnp.ndarray,
                      frame_idx: jnp.ndarray,
                      update_rate: float = 0.1, thres_close: float = 0.95,
                      chunk: int = 4096, occ=None, occ_bound=None):
    """One static-shape bank update step (single object class).

    Args:
      keys [N, dk], values [N, dv], valid [N] bool, birth [N] f32 (frame the
      slot was written), usage [N] f32 (accumulated log usage), new_keys
      [M, dk], new_values [M, dv], frame_idx scalar (current frame number).
      occ: optional traced scalar — this object's occupancy under the
        dense-prefix invariant (all valid slots in ``[0, occ)``). When given,
        appends fill the prefix tail ``[occ, ...)`` like the reference's
        ``torch.cat`` growth (FeatureBank.py:106-110), falling back to LFU
        eviction only once the bank is full, and the returned tuple gains the
        new occupancy.
      occ_bound: optional traced scalar work bound for the cosine match
        (``max`` of occ over vmapped objects — must be unbatched under vmap).

    Returns: (keys, values, valid, birth, usage, stats) — or
    (keys, values, valid, birth, usage, occ_new, stats) when ``occ`` given.
    """
    n, dk = keys.shape
    dv = values.shape[1]
    m = new_keys.shape[0]

    normed_new_k, _ = _safe_normalize(new_keys)
    normed_new_v, _ = _safe_normalize(new_values)

    if occ_bound is not None and n > OCC_CHUNK:
        best_corr, best_idx = _best_match_occ(keys, valid,
                                              normed_new_k, occ_bound)
    else:
        bank_mag_k = jnp.linalg.norm(keys.astype(jnp.float32), axis=1)
        best_corr, best_idx = _best_match(keys, bank_mag_k, valid,
                                          normed_new_k, chunk)
    merge_mask = best_corr > thres_close

    # ---- Merge (O(M) work): group incoming features by matched slot,
    # gather only the touched bank rows, EMA them, scatter back. -----------
    (k_mean, v_mean), row_ok, row_slot = _sorted_group_means(
        (normed_new_k, normed_new_v), best_idx, merge_mask)
    slot_g = jnp.clip(row_slot, 0, n - 1)
    old_k = keys[slot_g].astype(jnp.float32)              # [M, dk]
    old_v = values[slot_g].astype(jnp.float32)            # [M, dv]
    nk_old, mag_ko = _safe_normalize(old_k)
    nv_old, mag_vo = _safe_normalize(old_v)
    r = update_rate
    merged_k = mag_ko * ((1.0 - r) * nk_old + r * k_mean)
    merged_v = mag_vo * ((1.0 - r) * nv_old + r * v_mean)
    # Dropped rows get DISTINCT out-of-bounds indices (n + i, discarded by
    # mode="drop"): jnp docs leave scatter behavior undefined when
    # unique_indices is passed with duplicate indices, even out-of-bounds
    # ones, so a shared drop index n would void the hint's contract.
    drop_ids = n + jnp.arange(m, dtype=jnp.int32)
    scat = jnp.where(row_ok, row_slot, drop_ids)
    # unique_indices: every written slot is distinct by construction (one
    # group per slot from _sorted_group_means; dropped rows land on their
    # own out-of-bounds index and write nothing) — lets XLA emit a vector
    # scatter instead of the serialized duplicate-safe form (the four bank
    # scatters profiled ~1.2 ms/step of the 12 ms fused step). The append
    # dest can repeat victims only when m > capacity (rank clipping on tiny
    # banks), so the hint is gated on the static shapes there.
    uniq_append = m <= n
    keys = keys.at[scat].set(merged_k.astype(keys.dtype), mode="drop",
                             unique_indices=True)
    values = values.at[scat].set(merged_v.astype(values.dtype), mode="drop",
                                 unique_indices=True)
    protected = jnp.zeros((n,), bool).at[scat].set(True, mode="drop",
                                                   unique_indices=True)

    # ---- Append + LFU evict ----------------------------------------------
    append_mask = jnp.logical_not(merge_mask)
    age = jnp.maximum(frame_idx - birth, 1.0)
    lfu = usage / age
    k = min(m, n)
    rank = jnp.cumsum(append_mask.astype(jnp.int32)) - 1   # [M]

    if occ is not None:
        # Dense-prefix fill (the reference's torch.cat growth): appends land
        # at [occ, occ + free_used); only once the prefix tail is exhausted
        # do lowest-LFU valid slots get overwritten. Keeps all valid slots
        # packed at the front so reads/matches stay O(occupancy).
        occ = jnp.asarray(occ, jnp.int32)
        free_n = jnp.int32(n) - occ
        appended_n = jnp.sum(append_mask.astype(jnp.int32))

        # The LFU victim selection (an approx-top-k over the whole
        # capacity, ~0.27 ms/step profiled) only matters once the dense
        # prefix is exhausted — lax.cond skips it for the entire
        # below-capacity life of a video. The dummy branch's all-1e30
        # prio makes every victim drop, which the dest select below never
        # consults while rank < free_n.
        def _select_victims(_):
            prio = jnp.where(
                jnp.logical_and(valid, jnp.logical_not(protected)),
                lfu, jnp.float32(1e30))
            if jax.default_backend() == "tpu":
                _, vo = jax.lax.approx_min_k(prio, k)
            else:
                _, vo = jax.lax.top_k(-prio, k)
            return vo.astype(jnp.int32), prio

        def _no_victims(_):
            return (jnp.zeros((k,), jnp.int32),
                    jnp.full((n,), 1e30, jnp.float32))

        # CRITICAL gating detail: this function runs under jax.vmap over
        # objects, and a vmapped lax.cond with a BATCHED predicate lowers
        # to select — both branches execute every step (the profiler shows
        # the approx-top-k running on a bank nowhere near capacity). The
        # per-object predicate (appended_n > free_n) is batched; occ_bound
        # (max occupancy over objects) is NOT, so the conservative bound
        # "even the fullest object cannot spill: max_occ + m <= n" keeps a
        # real branch after batching. When it does fire, under-capacity
        # objects run _select_victims too — harmless, their dest select
        # never consults victims while rank < free_n, so results are
        # bitwise-identical either way. VFLOOD_EVICT_GATE=batched restores
        # the per-object predicate for A/B.
        if occ_bound is not None and \
                os.environ.get("VFLOOD_EVICT_GATE", "unbatched") != "batched":
            maybe_evict = jnp.asarray(occ_bound, jnp.int32) + \
                jnp.int32(m) > jnp.int32(n)
        else:
            maybe_evict = appended_n > free_n
        victim_order, prio = jax.lax.cond(maybe_evict,
                                          _select_victims, _no_victims,
                                          operand=None)
        evict_rank = jnp.clip(rank - free_n, 0, k - 1)
        victim = victim_order[evict_rank].astype(jnp.int32)
        # A 1e30 victim means no evictable valid slot is left (only possible
        # on tiny banks where M ~ capacity): drop that append rather than
        # overwrite an out-of-prefix slot.
        victim = jnp.where(prio[victim] < 1e30, victim, n)
        dest = jnp.where(rank < free_n, occ + rank, victim)
        dest = jnp.where(append_mask, dest, n)             # n -> dropped
        evicted = jnp.clip(appended_n - free_n, 0, occ)
        occ_new = jnp.minimum(occ + appended_n, jnp.int32(n))
    else:
        # Replacement priority: free slots first (-2), then lowest-LFU valid
        # slots; slots merged this frame are protected. At most M slots can
        # be overwritten per step, so a top-k (k = M) over negated priority
        # replaces a full argsort of the 100k-slot bank.
        prio = jnp.where(valid, lfu, -2.0)
        prio = jnp.where(protected, jnp.float32(1e30), prio)
        if jax.default_backend() == "tpu":
            # TPU-optimized approximate k-smallest (recall ~0.95): eviction
            # is an LFU *heuristic*, so near-lowest victims are as good as
            # exact, and approx_min_k avoids the sort-bound exact top_k over
            # the 100k-slot bank. CPU/other backends keep the exact path.
            _, victim_order = jax.lax.approx_min_k(prio, k)    # [k] slot ids
        else:
            _, victim_order = jax.lax.top_k(-prio, k)          # [k] slot ids
        dest = jnp.where(append_mask,
                         victim_order[jnp.clip(rank, 0, k - 1)],
                         n)                                # n -> dropped
        evicted = jnp.sum(jnp.where(append_mask,
                                    valid[jnp.clip(dest, 0, n - 1)], False))

    # dest slots are distinct (dense-prefix ranks / distinct victims) unless
    # m > capacity; dropped rows get distinct OOB indices like the merge
    # scatter above so the unique_indices hint holds unconditionally.
    dest = jnp.where(dest < n, dest, drop_ids)
    keys = keys.at[dest].set(new_keys, mode="drop",
                             unique_indices=uniq_append)
    values = values.at[dest].set(new_values, mode="drop",
                                 unique_indices=uniq_append)
    birth = birth.at[dest].set(jnp.float32(frame_idx), mode="drop",
                               unique_indices=uniq_append)
    usage = usage.at[dest].set(0.0, mode="drop", unique_indices=uniq_append)
    valid = valid.at[dest].set(True, mode="drop", unique_indices=uniq_append)

    usage = jnp.clip(usage, 0.0, 1e5)  # reference FeatureBank.py:115

    stats = BankUpdateStats(
        merged_n=jnp.sum(merge_mask.astype(jnp.int32)),
        appended_n=jnp.sum(append_mask.astype(jnp.int32)),
        evicted_n=evicted.astype(jnp.int32),
    )
    if occ is not None:
        return keys, values, valid, birth, usage, occ_new, stats
    return keys, values, valid, birth, usage, stats
