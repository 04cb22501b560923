"""Memory-read attention over the Adaptive Feature Bank.

TPU-native redesign of the reference Matcher (video_module/model/AFB_URR.py:
130-178): per-object softmax attention where queries are the pixels of the
current frame and keys/values are the banked features of all past frames.

The reference materialises the full [bank_n, HW] probability matrix and falls
back to CPU on CUDA OOM (AFB_URR.py:147-157). Here the bank axis is processed
in fixed-size chunks with an online (flash-style) softmax, so memory is
O(chunk) regardless of bank size, shapes stay static, and the whole read jits.

Also emits the per-slot usage count ``sum_hw [p > thres]`` that drives the
bank's LFU bookkeeping (reference AFB_URR.py:161-174) — computed in a second
sweep once the softmax normaliser is known.

A Pallas kernel (``impl='pallas'``) fuses both sweeps with double-buffered HBM
-> VMEM DMA for large banks; the XLA scan path is the reference semantics.
"""

from __future__ import annotations

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _chunk_count(n: int, chunk: int) -> int:
    return -(-n // chunk)


def _xla_read(keys: jnp.ndarray, values: jnp.ndarray, valid: jnp.ndarray,
              q: jnp.ndarray, thres: float, chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """keys [N, dk], values [N, dv], valid [N], q [P, dk] ->
    (mem [P, dv], cnt [N])."""
    n, dk = keys.shape
    dv = values.shape[1]
    p_n = q.shape[0]
    chunk = min(chunk, n)
    n_chunks = _chunk_count(n, chunk)
    pad_n = n_chunks * chunk

    scale = 1.0 / math.sqrt(dk)

    keys_p = jnp.pad(keys, ((0, pad_n - n), (0, 0)))
    values_p = jnp.pad(values, ((0, pad_n - n), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad_n - n))

    keys_c = keys_p.reshape(n_chunks, chunk, dk)
    values_c = values_p.reshape(n_chunks, chunk, dv)
    valid_c = valid_p.reshape(n_chunks, chunk)

    # Feed the MXU in the bank's storage dtype (bf16 banks run the matmuls
    # at full MXU rate) while accumulating in f32 via preferred_element_type.
    mm_dtype = keys.dtype
    q_mm = q.astype(mm_dtype)

    def sweep1(carry, inp):
        m, l, acc = carry
        k_c, v_c, ok = inp
        s = jax.lax.dot(q_mm, k_c.T,
                        preferred_element_type=jnp.float32) * scale
        s = jnp.where(ok[None, :], s, NEG_INF)                  # [P, chunk]
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        alpha = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[:, None])
        l_new = l * alpha + jnp.sum(e, axis=1)
        pv = jax.lax.dot(e.astype(mm_dtype), v_c,
                         preferred_element_type=jnp.float32)
        acc_new = acc * alpha[:, None] + pv
        return (m_new, l_new, acc_new), None

    init = (jnp.full((p_n,), NEG_INF, jnp.float32),
            jnp.zeros((p_n,), jnp.float32),
            jnp.zeros((p_n, dv), jnp.float32))
    (m, l, acc), _ = jax.lax.scan(sweep1, init, (keys_c, values_c, valid_c))
    l_safe = jnp.maximum(l, 1e-30)
    mem = acc / l_safe[:, None]

    # Second sweep: usage counts need the final normaliser.
    log_thres = jnp.log(thres) + jnp.log(l_safe) + m               # [P]

    def sweep2(_, inp):
        k_c, ok = inp
        s = jax.lax.dot(q_mm, k_c.T,
                        preferred_element_type=jnp.float32) * scale
        hit = jnp.logical_and(s > log_thres[:, None], ok[None, :])
        return None, jnp.sum(hit.astype(jnp.float32), axis=0)      # [chunk]

    _, cnt_c = jax.lax.scan(sweep2, None, (keys_c, valid_c))
    cnt = cnt_c.reshape(pad_n)[:n]
    return mem.astype(values.dtype), cnt


def _xla_read_dense(keys: jnp.ndarray, values: jnp.ndarray,
                    valid: jnp.ndarray, q: jnp.ndarray,
                    thres: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot read: materialises the [P, N] score matrix. Fastest when it
    fits HBM (one big MXU matmul instead of a serialised chunk scan).

    For bf16 banks the [P, N] score/exp/prob intermediates are kept in bf16
    (the read is HBM-bound, so halving the big-tensor traffic is worth the
    ~0.5% softmax-weight noise — within the documented bf16 production
    tolerance); f32 banks keep full-precision intermediates."""
    dk = keys.shape[1]
    scale = 1.0 / math.sqrt(dk)
    mm_dtype = keys.dtype
    big_dtype = mm_dtype if mm_dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot(q.astype(mm_dtype), keys.T,
                    preferred_element_type=big_dtype) * \
        jnp.asarray(scale, big_dtype)                             # [P, N]
    s = jnp.where(valid[None, :], s, jnp.asarray(NEG_INF, big_dtype))
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    # row normaliser accumulated in f32 regardless of storage dtype
    l = jnp.maximum(jnp.sum(e, axis=1, keepdims=True,
                            dtype=jnp.float32), 1e-30)
    p = e * (1.0 / l).astype(big_dtype)
    mem = jax.lax.dot(p.astype(mm_dtype), values,
                      preferred_element_type=jnp.float32)
    cnt = jnp.sum(jnp.logical_and(e > (thres * l).astype(big_dtype),
                                  valid[None, :]),
                  axis=0).astype(jnp.float32)
    return mem.astype(values.dtype), cnt


def _xla_read_occ(keys: jnp.ndarray, values: jnp.ndarray, valid: jnp.ndarray,
                  q: jnp.ndarray, thres: float, chunk: int,
                  occ_bound: jnp.ndarray,
                  count: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Occupancy-bounded read: identical semantics to the full read, but only
    the first ``ceil(occ_bound / chunk)`` bank chunks are visited (a traced
    trip count — no recompiles as the bank fills).

    The bank keeps valid slots densely packed at the front (the dense-prefix
    invariant maintained by ``bank_merge_append(occ=...)``), mirroring the
    reference bank which *grows* with ``torch.cat`` (FeatureBank.py:106-110)
    and therefore pays O(occupancy), not O(capacity), per frame. ``occ_bound``
    is only a work bound: the ``valid`` mask is still applied inside each
    chunk, so any bound >= highest valid slot index is exact.

    ``occ_bound`` must be unbatched under vmap (pass ``max`` over objects) so
    the loop lowers to a single shared-trip-count while_loop.

    For bf16 banks the [P, chunk] score/exp intermediates stay bf16 (same
    HBM-traffic trade as ``_xla_read_dense``: the read is bandwidth-bound and
    the ~0.5% softmax-weight noise is within the documented bf16 production
    tolerance); the running max / normaliser / accumulator stay f32.
    """
    n, dk = keys.shape
    dv = values.shape[1]
    p_n = q.shape[0]
    chunk = min(chunk, n)
    n_chunks = _chunk_count(n, chunk)
    pad_n = n_chunks * chunk

    scale = 1.0 / math.sqrt(dk)
    keys_p = jnp.pad(keys, ((0, pad_n - n), (0, 0)))
    values_p = jnp.pad(values, ((0, pad_n - n), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad_n - n))

    mm_dtype = keys.dtype
    big_dtype = mm_dtype if mm_dtype == jnp.bfloat16 else jnp.float32
    q_mm = q.astype(mm_dtype)
    n_iter = jnp.clip((occ_bound + chunk - 1) // chunk, 1, n_chunks)

    def scores(i):
        start = i * chunk
        k_c = jax.lax.dynamic_slice(keys_p, (start, 0), (chunk, dk))
        ok = jax.lax.dynamic_slice(valid_p, (start,), (chunk,))
        s = jax.lax.dot(q_mm, k_c.T,
                        preferred_element_type=big_dtype) * \
            jnp.asarray(scale, big_dtype)
        return jnp.where(ok[None, :], s,
                         jnp.asarray(NEG_INF, big_dtype)), start, ok

    def body1(i, carry):
        m, l, acc = carry
        s, start, _ = scores(i)
        v_c = jax.lax.dynamic_slice(values_p, (start, 0), (chunk, dv))
        m_new = jnp.maximum(m, jnp.max(s, axis=1).astype(jnp.float32))
        alpha = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[:, None].astype(big_dtype))
        l_new = l * alpha + jnp.sum(e, axis=1, dtype=jnp.float32)
        pv = jax.lax.dot(e.astype(mm_dtype), v_c,
                         preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha[:, None] + pv

    init = (jnp.full((p_n,), NEG_INF, jnp.float32),
            jnp.zeros((p_n,), jnp.float32),
            jnp.zeros((p_n, dv), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, n_iter, body1, init)
    l_safe = jnp.maximum(l, 1e-30)
    mem = acc / l_safe[:, None]

    if not count:   # microbench-only: attribute the usage-count sweep's cost
        return mem.astype(values.dtype), jnp.zeros((n,), jnp.float32)

    log_thres = (jnp.log(thres) + jnp.log(l_safe) + m).astype(big_dtype)

    def body2(i, cnt):
        s, start, ok = scores(i)
        hit = jnp.logical_and(s > log_thres[:, None], ok[None, :])
        c = jnp.sum(hit.astype(jnp.float32), axis=0)               # [chunk]
        return jax.lax.dynamic_update_slice(cnt, c, (start,))

    cnt = jax.lax.fori_loop(0, n_iter, body2,
                            jnp.zeros((pad_n,), jnp.float32))[:n]
    return mem.astype(values.dtype), cnt


# Use the dense one-shot path when the score matrix stays under this many
# elements (f32 bytes = 4x): 256M elements = 1 GB scores.
DENSE_SCORE_ELEMENTS = 256 * 1024 * 1024

# Occupancy-bounded loop chunk: big enough that each iteration's two matmuls
# ([P, chunk] x [chunk, dv]) fill the MXU, small enough that a near-empty
# bank costs one iteration.
OCC_CHUNK = 8192


def bank_attention_read(keys: jnp.ndarray, values: jnp.ndarray,
                        valid: jnp.ndarray, q: jnp.ndarray,
                        thres: float = 1e-3, chunk: int = 4096,
                        impl: str = "auto",
                        occ_bound=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax memory read: ``mem = softmax_n(K q / sqrt(dk))^T V``.

    Args:
      keys:   [N, dk] banked keys (invalid slots may hold garbage).
      values: [N, dv] banked values.
      valid:  [N] bool slot validity mask.
      q:      [P, dk] query-pixel keys.
      thres:  probability threshold for the usage count (reference
              Matcher.thres_valid = 1e-3).
      chunk:  bank-axis chunk size.
      impl:   'xla' | 'pallas' | 'auto'.
      occ_bound: optional traced scalar upper bound on the highest valid slot
              index + 1. When given, only ``ceil(occ_bound / OCC_CHUNK)``
              chunks are visited — O(occupancy) work per read, matching the
              reference's growing bank. Must be unbatched under vmap.

    Returns:
      mem [P, dv], usage count cnt [N] (float32).
    """
    if impl == "pallas":
        from .attention_pallas import pallas_bank_read
        return pallas_bank_read(keys, values, valid, q, thres)
    # Trace-time env override for within-session A/B of the occupancy-loop
    # chunk (bigger chunks = fewer serialized iterations on a full bank,
    # more minimum work on a near-empty one).
    occ_chunk = int(os.environ.get("VFLOOD_OCC_CHUNK", str(OCC_CHUNK)))
    if occ_bound is not None and keys.shape[0] > occ_chunk:
        return _xla_read_occ(keys, values, valid, q, thres, occ_chunk,
                             occ_bound)
    if impl == "dense" or (impl == "auto" and
                           keys.shape[0] * q.shape[0] <= DENSE_SCORE_ELEMENTS):
        return _xla_read_dense(keys, values, valid, q, thres)
    return _xla_read(keys, values, valid, q, thres, chunk)
