"""Pallas TPU kernel: flash-style memory read over the feature bank.

The hot kernel of video propagation (reference Matcher, AFB_URR.py:140-178):
queries = frame pixels (P ~ 1-2k), keys/values = banked features
(N up to ~100k). The kernel streams bank chunks HBM -> VMEM while the
accumulators (running max / normaliser / weighted values) stay resident in
VMEM scratch across grid steps — no [P, N] score materialisation, bf16 MXU
matmuls with f32 accumulation.

Usage counts (the LFU signal) need the final normaliser, so they are
computed by a second light sweep (one extra QK matmul) in
:func:`pallas_bank_read`.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _read_kernel(q_ref, k_ref, v_ref, ok_ref, mem_ref, m_out_ref, l_out_ref,
                 m_ref, l_ref, acc_ref, *, scale: float):
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]                                   # [P, dk] bf16
    k = k_ref[:]                                   # [C, dk] bf16
    ok = ok_ref[:]                                 # [C, 1] f32 {0,1}

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [P, C]
    s = jnp.where((ok[:, 0] > 0)[None, :], s, NEG_INF)

    m_prev = m_ref[:]                              # [P, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)                # [P, 1]
    e = jnp.exp(s - m_new)                         # [P, C]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(e, axis=1, keepdims=True)
    pv = jax.lax.dot(e.astype(v_ref.dtype), v_ref[:],
                     preferred_element_type=jnp.float32)   # [P, dv]
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(i == n_chunks - 1)
    def _():
        l_safe = jnp.maximum(l_ref[:], 1e-30)
        mem_ref[:] = (acc_ref[:] / l_safe).astype(mem_ref.dtype)
        m_out_ref[:] = m_ref[:]
        l_out_ref[:] = l_safe


def _count_kernel(q_ref, k_ref, ok_ref, log_thres_ref, cnt_ref, *,
                  scale: float):
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [P, C]
    hit = jnp.logical_and(s > log_thres_ref[:],
                          (ok_ref[:][:, 0] > 0)[None, :])
    cnt_ref[:] = jnp.sum(hit.astype(jnp.float32), axis=0,
                         keepdims=True).T                  # [C, 1]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("thres", "chunk"))
def pallas_bank_read(keys: jnp.ndarray, values: jnp.ndarray,
                     valid: jnp.ndarray, q: jnp.ndarray,
                     thres: float = 1e-3, chunk: int = 2048
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ops.attention.bank_attention_read (single object):
    keys [N, dk], values [N, dv], valid [N], q [P, dk] ->
    (mem [P, dv], cnt [N])."""
    n, dk = keys.shape
    dv = values.shape[1]
    p = q.shape[0]
    scale = 1.0 / math.sqrt(dk)

    chunk = min(chunk, _round_up(n, 128))
    n_pad = _round_up(n, chunk)
    p_pad = _round_up(p, 8)

    mm_dtype = keys.dtype if keys.dtype == jnp.bfloat16 else jnp.float32
    keys_p = jnp.pad(keys, ((0, n_pad - n), (0, 0))).astype(mm_dtype)
    values_p = jnp.pad(values, ((0, n_pad - n), (0, 0))).astype(mm_dtype)
    ok_p = jnp.pad(valid.astype(jnp.float32), (0, n_pad - n))[:, None]
    q_p = jnp.pad(q, ((0, p_pad - p), (0, 0))).astype(mm_dtype)

    n_chunks = n_pad // chunk
    grid = (n_chunks,)

    mem, m_out, l_out = pl.pallas_call(
        functools.partial(_read_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, dk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, dv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_pad, dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, dv), values.dtype),
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p_pad, 1), jnp.float32),
            pltpu.VMEM((p_pad, 1), jnp.float32),
            pltpu.VMEM((p_pad, dv), jnp.float32),
        ],
    )(q_p, keys_p, values_p, ok_p)

    log_thres = jnp.log(thres) + jnp.log(l_out) + m_out       # [p_pad, 1]
    # zero-padded queries must not contribute hits
    row_ok = (jnp.arange(p_pad) < p)[:, None]
    log_thres = jnp.where(row_ok, log_thres, jnp.float32(1e30))

    cnt = pl.pallas_call(
        functools.partial(_count_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, dk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
    )(q_p, keys_p, ok_p, log_thres)

    return mem[:p], cnt[:n, 0]
