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


def _local_partials(keys, values, valid, q, scale):
    """Local softmax partials over this shard's bank slots.

    keys [n, dk], values [n, dv], valid [n], q [p, dk] ->
    (m [p], l [p], acc [p, dv], s-scores recomputable later)."""
    s = (q @ keys.astype(jnp.float32).T) * scale          # [p, n]
    s = jnp.where(valid[None, :], s, NEG_INF)
    m = jnp.max(s, axis=1)
    e = jnp.exp(s - m[:, None])
    l = jnp.sum(e, axis=1)
    acc = e @ values.astype(jnp.float32)
    return s, m, l, acc


def sharded_bank_attention_read(mesh, keys, values, valid, q,
                                thres: float = 1e-3
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed read: keys/values/valid sharded on the bank axis over
    ``model``; q replicated. Returns (mem [p, dv] replicated, cnt [N]
    sharded like the bank).
    """
    dk = keys.shape[1]
    scale = 1.0 / math.sqrt(dk)

    def kernel(keys, values, valid, q):
        q = q.astype(jnp.float32)
        s, m, l, acc = _local_partials(keys, values, valid, q, scale)
        g_m = jax.lax.pmax(m, MODEL_AXIS)
        corr = jnp.exp(m - g_m)
        g_l = jax.lax.psum(l * corr, MODEL_AXIS)
        g_acc = jax.lax.psum(acc * corr[:, None], MODEL_AXIS)
        g_l_safe = jnp.maximum(g_l, 1e-30)
        mem = (g_acc / g_l_safe[:, None]).astype(values.dtype)
        # usage count against the *global* normaliser
        log_thres = jnp.log(thres) + jnp.log(g_l_safe) + g_m      # [p]
        hit = jnp.logical_and(s > log_thres[:, None], valid[None, :])
        cnt = jnp.sum(hit.astype(jnp.float32), axis=0)            # local [n]
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
