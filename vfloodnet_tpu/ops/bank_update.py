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

import math
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


def _best_match(normed_bank: jnp.ndarray, valid: jnp.ndarray,
                normed_new: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Running argmax of cosine correlation, chunked over the bank axis.

    normed_bank [N, d], valid [N], normed_new [M, d] -> (best_corr [M],
    best_idx [M]).
    """
    n, d = normed_bank.shape
    m = normed_new.shape[0]
    if n * m <= 256 * 1024 * 1024:
        # dense one-shot: one big MXU matmul beats a serialised chunk scan
        corr = jax.lax.dot(normed_new.astype(normed_bank.dtype),
                           normed_bank.T,
                           preferred_element_type=jnp.float32)   # [M, N]
        corr = jnp.where(valid[None, :], corr, -2.0)
        best_idx = jnp.argmax(corr, axis=1).astype(jnp.int32)
        best_corr = jnp.take_along_axis(corr, best_idx[:, None], axis=1)[:, 0]
        return best_corr, best_idx
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    bank_c = jnp.pad(normed_bank, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    valid_c = jnp.pad(valid, (0, pad)).reshape(n_chunks, chunk)

    mm_dtype = normed_bank.dtype
    new_mm = normed_new.astype(mm_dtype)

    def step(carry, inp):
        best_corr, best_idx = carry
        (k_c, ok), ci = inp
        corr = jax.lax.dot(new_mm, k_c.T,
                           preferred_element_type=jnp.float32)  # [M, chunk]
        corr = jnp.where(ok[None, :], corr, -2.0)
        local_best = jnp.argmax(corr, axis=1)
        local_val = jnp.take_along_axis(corr, local_best[:, None], axis=1)[:, 0]
        better = local_val > best_corr
        best_idx = jnp.where(better, ci * chunk + local_best, best_idx)
        best_corr = jnp.maximum(best_corr, local_val)
        return (best_corr, best_idx), None

    init = (jnp.full((m,), -2.0, jnp.float32), jnp.zeros((m,), jnp.int32))
    (best_corr, best_idx), _ = jax.lax.scan(
        step, init, ((bank_c, valid_c), jnp.arange(n_chunks, dtype=jnp.int32)))
    return best_corr, best_idx


def _segment_mean(data: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray,
                  num_segments: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked segment mean: mean of data rows grouped by idx (mask selects
    contributing rows). Returns (mean [num_segments, d], hit_count [num_segments])."""
    d = data.shape[1]
    safe_idx = jnp.where(mask, idx, num_segments)
    total = jnp.zeros((num_segments + 1, d), jnp.float32).at[safe_idx].add(
        data.astype(jnp.float32))
    cnt = jnp.zeros((num_segments + 1,), jnp.float32).at[safe_idx].add(1.0)
    mean = total[:num_segments] / jnp.maximum(cnt[:num_segments, None], 1.0)
    return mean, cnt[:num_segments]


def bank_merge_append(keys: jnp.ndarray, values: jnp.ndarray, valid: jnp.ndarray,
                      birth: jnp.ndarray, usage: jnp.ndarray,
                      new_keys: jnp.ndarray, new_values: jnp.ndarray,
                      frame_idx: jnp.ndarray,
                      update_rate: float = 0.1, thres_close: float = 0.95,
                      chunk: int = 4096):
    """One static-shape bank update step (single object class).

    Args:
      keys [N, dk], values [N, dv], valid [N] bool, birth [N] f32 (frame the
      slot was written), usage [N] f32 (accumulated log usage), new_keys
      [M, dk], new_values [M, dv], frame_idx scalar (current frame number).

    Returns: (keys, values, valid, birth, usage, stats).
    """
    n, dk = keys.shape
    dv = values.shape[1]
    m = new_keys.shape[0]

    normed_bank_k, mag_k = _safe_normalize(keys)
    normed_bank_v, mag_v = _safe_normalize(values)
    normed_new_k, _ = _safe_normalize(new_keys)
    normed_new_v, _ = _safe_normalize(new_values)

    best_corr, best_idx = _best_match(normed_bank_k, valid, normed_new_k, chunk)
    merge_mask = best_corr > thres_close

    # ---- Merge: masked segment-mean EMA into matched slots ----------------
    k_mean, hits = _segment_mean(normed_new_k, best_idx, merge_mask, n)
    v_mean, _ = _segment_mean(normed_new_v, best_idx, merge_mask, n)
    hit_mask = (hits > 0)[:, None]
    r = update_rate
    merged_k = mag_k * ((1.0 - r) * normed_bank_k + r * k_mean)
    merged_v = mag_v * ((1.0 - r) * normed_bank_v + r * v_mean)
    keys = jnp.where(hit_mask, merged_k.astype(keys.dtype), keys)
    values = jnp.where(hit_mask, merged_v.astype(values.dtype), values)

    # ---- Append + LFU evict: one priority argsort + scatter ---------------
    append_mask = jnp.logical_not(merge_mask)
    age = jnp.maximum(frame_idx - birth, 1.0)
    lfu = usage / age
    # Replacement priority: free slots first (-2), then lowest-LFU valid
    # slots; slots merged this frame are protected. At most M slots can be
    # overwritten per step, so a top-k (k = M) over negated priority replaces
    # a full argsort of the 100k-slot bank.
    protected = hits > 0
    prio = jnp.where(valid, lfu, -2.0)
    prio = jnp.where(protected, jnp.float32(1e30), prio)
    k = min(m, n)
    _, victim_order = jax.lax.top_k(-prio, k)              # [k] slot ids

    rank = jnp.cumsum(append_mask.astype(jnp.int32)) - 1   # [M]
    rank = jnp.clip(rank, 0, k - 1)
    dest = jnp.where(append_mask, victim_order[rank], n)   # n -> dropped

    evicted = jnp.sum(jnp.where(append_mask,
                                valid[jnp.clip(dest, 0, n - 1)], False))

    keys = keys.at[dest].set(new_keys, mode="drop")
    values = values.at[dest].set(new_values, mode="drop")
    birth = birth.at[dest].set(jnp.float32(frame_idx), mode="drop")
    usage = usage.at[dest].set(0.0, mode="drop")
    valid = valid.at[dest].set(True, mode="drop")

    usage = jnp.clip(usage, 0.0, 1e5)  # reference FeatureBank.py:115

    stats = BankUpdateStats(
        merged_n=jnp.sum(merge_mask.astype(jnp.int32)),
        appended_n=jnp.sum(append_mask.astype(jnp.int32)),
        evicted_n=evicted.astype(jnp.int32),
    )
    return keys, values, valid, birth, usage, stats
