"""Bank-sharded memory-read attention (sequence/context parallelism).

The Adaptive Feature Bank plays the role of a KV cache over video history
(SURVEY.md §2.4, §5 "Long-context"): for multi-chip inference the bank's
capacity axis is sharded across the mesh's ``model`` axis and the softmax
read is combined with XLA collectives — each chip computes a local online
softmax over its bank shard, then (max, normaliser, weighted-value) partials
are combined with ``pmax``/``psum`` over ICI. This is the ring-attention-style
decomposition specialised to a one-query-frame / huge-KV workload.

Usage counts come out sharded along the bank axis (they are per-slot), so the
subsequent bank update also runs shard-local.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import MODEL_AXIS

NEG_INF = -1e30
OCC_CHUNK = 8192


def _shard_occ_bound(valid: jnp.ndarray) -> jnp.ndarray:
    """Exact per-shard work bound: highest valid slot index + 1 (0 when the
    shard is empty). Unlike trusting a prefix counter, this stays CORRECT
    even if the local dense-prefix invariant were ever violated — chunks
    past the bound provably contain no valid slot. It is a tight bound
    (O(local occupancy) work) because the sharded append policy fills each
    shard's lowest free slots first (sharded_update.py: global victim
    selection tie-breaks by gathered position, so shards fill
    sequentially and slots within a shard lowest-index-first)."""
    n = valid.shape[0]
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(valid, idx, 0))


def _local_partials_occ(keys, values, valid, q, scale, occ_loc,
                        chunk: int = OCC_CHUNK):
    """Occupancy-bounded local softmax partials over this shard's slots
    (the shard-local analogue of ops/attention.py::_xla_read_occ body1 —
    only ``ceil(occ_loc / chunk)`` chunks are visited, a traced trip
    count). Returns (m [p], l [p], acc [p, dv]) in f32."""
    n, dk = keys.shape
    dv = values.shape[1]
    p_n = q.shape[0]
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad_n = n_chunks * chunk
    keys_p = jnp.pad(keys, ((0, pad_n - n), (0, 0)))
    values_p = jnp.pad(values, ((0, pad_n - n), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad_n - n))

    mm_dtype = keys.dtype
    big = mm_dtype if mm_dtype == jnp.bfloat16 else jnp.float32
    q_mm = q.astype(mm_dtype)
    n_iter = jnp.clip((occ_loc + chunk - 1) // chunk, 0, n_chunks)

    def chunk_scores(i):
        start = i * chunk
        k_c = jax.lax.dynamic_slice(keys_p, (start, 0), (chunk, dk))
        ok = jax.lax.dynamic_slice(valid_p, (start,), (chunk,))
        s = jax.lax.dot(q_mm, k_c.T, preferred_element_type=big) * \
            jnp.asarray(scale, big)
        return jnp.where(ok[None, :], s, jnp.asarray(NEG_INF, big)), start

    def body(carry):
        i, m, l, acc = carry
        s, start = chunk_scores(i)
        v_c = jax.lax.dynamic_slice(values_p, (start, 0), (chunk, dv))
        m_new = jnp.maximum(m, jnp.max(s, axis=1).astype(jnp.float32))
        alpha = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[:, None].astype(big))
        l_new = l * alpha + jnp.sum(e, axis=1, dtype=jnp.float32)
        pv = jax.lax.dot(e.astype(mm_dtype), v_c,
                         preferred_element_type=jnp.float32)
        return i + 1, m_new, l_new, acc * alpha[:, None] + pv

    # the trip bound (and body outputs) vary over the shard axis, so the
    # init carry must be marked varying for shard_map's manual typing
    init = jax.tree.map(
        lambda x: jax.lax.pcast(x, (MODEL_AXIS,), to="varying"),
        (jnp.int32(0), jnp.full((p_n,), NEG_INF, jnp.float32),
         jnp.zeros((p_n,), jnp.float32),
         jnp.zeros((p_n, dv), jnp.float32)))
    _, m, l, acc = jax.lax.while_loop(lambda c: c[0] < n_iter, body, init)
    return m, l, acc, (keys_p, valid_p, n_iter, chunk, n_chunks, chunk_scores)


def sharded_bank_attention_read(mesh, keys, values, valid, q,
                                thres: float = 1e-3
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed read: keys/values/valid sharded on the bank axis over
    ``model``; q replicated. Returns (mem [p, dv] replicated, cnt [N]
    sharded like the bank).

    Per-shard work is O(local occupancy), not O(capacity/n_shards): each
    shard bounds its chunk loop by its highest valid slot (exact), so a
    near-empty sharded bank costs what the single-device occupancy-bounded
    engine pays, and collectives still ride ICI once per frame.
    """
    dk = keys.shape[1]
    scale = 1.0 / math.sqrt(dk)

    def kernel(keys, values, valid, q):
        q = q.astype(jnp.float32)
        n = keys.shape[0]
        occ_loc = _shard_occ_bound(valid)
        m, l, acc, (keys_p, valid_p, n_iter, chunk, n_chunks,
                    chunk_scores) = _local_partials_occ(
                        keys, values, valid, q, scale, occ_loc)
        g_m = jax.lax.pmax(m, MODEL_AXIS)
        corr = jnp.exp(m - g_m)
        g_l = jax.lax.psum(l * corr, MODEL_AXIS)
        g_acc = jax.lax.psum(acc * corr[:, None], MODEL_AXIS)
        g_l_safe = jnp.maximum(g_l, 1e-30)
        mem = (g_acc / g_l_safe[:, None]).astype(values.dtype)

        # usage counts vs the *global* normaliser: a second occupancy-
        # bounded sweep (chunks past the bound hold no valid slot -> 0).
        log_thres = jnp.log(thres) + jnp.log(g_l_safe) + g_m      # [p]

        def cnt_body(carry):
            i, cnt = carry
            s, start = chunk_scores(i)
            hit = s > log_thres[:, None].astype(s.dtype)
            c = jnp.sum(hit.astype(jnp.float32), axis=0)          # [chunk]
            return i + 1, jax.lax.dynamic_update_slice(cnt, c, (start,))

        pad_n = n_chunks * chunk
        cnt_init = jax.tree.map(
            lambda x: jax.lax.pcast(x, (MODEL_AXIS,), to="varying"),
            (jnp.int32(0), jnp.zeros((pad_n,), jnp.float32)))
        _, cnt_p = jax.lax.while_loop(
            lambda c: c[0] < n_iter, cnt_body, cnt_init)
        cnt = jnp.where(valid, cnt_p[:n], 0.0)
        return mem, cnt

    spec_bank = P(MODEL_AXIS)
    spec_bank2d = P(MODEL_AXIS, None)
    fn = shard_map(kernel, mesh=mesh,
                   in_specs=(spec_bank2d, spec_bank2d, spec_bank, P(None, None)),
                   out_specs=(P(None, None), spec_bank))
    return fn(keys, values, valid, q)


def shard_bank_state(mesh, state):
    """Place a FeatureBankState with the capacity axis sharded over 'model'
    (obj axis replicated)."""
    cap_spec = NamedSharding(mesh, P(None, MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    return state.replace(
        keys=jax.device_put(state.keys, NamedSharding(mesh, P(None, MODEL_AXIS, None))),
        values=jax.device_put(state.values, NamedSharding(mesh, P(None, MODEL_AXIS, None))),
        valid=jax.device_put(state.valid, cap_spec),
        birth=jax.device_put(state.birth, cap_spec),
        usage=jax.device_put(state.usage, cap_spec),
        peak_n=jax.device_put(state.peak_n, rep),
        replace_n=jax.device_put(state.replace_n, rep),
        # The sharded engine keeps full-capacity semantics (the prefix
        # invariant doesn't hold per shard); occ rides along replicated.
        occ=jax.device_put(state.occ, rep),
    )
