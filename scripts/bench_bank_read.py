#!/usr/bin/env python
"""Microbench: bank attention-read implementations on the real chip.

Compares the three implementations of the hot kernel (reference Matcher,
video_module/model/AFB_URR.py:140-178) at the production operating shape —
queries = 480p r4 pixels, bank = budget//obj_n slots, bf16 storage:

- ``dense``  : one [P, N] score materialisation (XLA fused)
- ``chunked``: lax.scan flash-style online softmax over bank chunks
- ``pallas`` : hand-written Pallas TPU kernel (ops/attention_pallas.py)

Prints ms/call and the agreement of each path against the f32 dense result.
Run standalone (one TPU process at a time — see CLAUDE.md).
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)   # progress visible when piped


def timeit(fn, *args, iters=20, warmup=3):
    # honest chained-carry timing (_bench_timing: the relay dedupes
    # identical calls and block_until_ready is a dispatch fence only)
    from _bench_timing import timeit as _timeit
    out = fn(*args)                     # callers want a sample output too
    return _timeit(fn, *args, iters=iters), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1620,
                    help="query pixels (480p r4 grid ~ 30x54)")
    ap.add_argument("--n", type=int, default=25_000,
                    help="bank slots (default kept small for tractable "
                         "remote-compile time; production point is 100k)")
    ap.add_argument("--dk", type=int, default=128)
    ap.add_argument("--dv", type=int, default=512)
    ap.add_argument("--valid_frac", type=float, default=0.7)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--pallas", action="store_true",
                    help="include the Pallas kernel (its remote compile has "
                         "hung >45 min at production shapes on this relay — "
                         "opt-in only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.ops.attention import bank_attention_read
    from vfloodnet_tpu.ops.attention_pallas import pallas_bank_read

    print("platform:", jax.devices()[0].platform)
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randn(args.n, args.dk).astype(np.float32))
    values = jnp.asarray(rng.randn(args.n, args.dv).astype(np.float32))
    valid = jnp.asarray(rng.rand(args.n) < args.valid_frac)
    q = jnp.asarray(rng.randn(args.p, args.dk).astype(np.float32))

    kb, vb, qb = (keys.astype(jnp.bfloat16), values.astype(jnp.bfloat16),
                  q.astype(jnp.bfloat16))

    # f32 dense as the numeric baseline
    print("compiling f32 dense reference ...")
    ref_mem, ref_cnt = jax.jit(
        lambda *a: bank_attention_read(*a, impl="dense"))(keys, values,
                                                          valid, q)
    ref_mem = np.asarray(ref_mem, np.float32)
    print("reference done")

    from vfloodnet_tpu.ops.attention import _xla_read_occ

    def occ_variant(chunk, occ, count=True):
        return jax.jit(lambda k, v, ok, qq: _xla_read_occ(
            k, v, ok, qq, 1e-3, chunk, jnp.int32(occ), count=count))

    cands = {
        "dense_bf16": jax.jit(
            lambda k, v, ok, qq: bank_attention_read(k, v, ok, qq,
                                                     impl="dense")),
        "chunked_bf16": jax.jit(
            lambda k, v, ok, qq: bank_attention_read(k, v, ok, qq,
                                                     impl="xla")),
        # production path (occ-bounded fori_loop) at full occupancy, over
        # candidate chunk sizes, plus a no-count variant to attribute the
        # usage-count sweep's share
        "occ_c8k_full": occ_variant(8192, args.n),
        "occ_c16k_full": occ_variant(16384, args.n),
        "occ_c32k_full": occ_variant(32768, args.n),
        "occ_c8k_nocnt": occ_variant(8192, args.n, count=False),
        "occ_c8k_1frame": occ_variant(8192, 1620),
    }
    if args.pallas:
        cands["pallas_bf16"] = (
            lambda k, v, ok, qq: pallas_bank_read(k, v, ok, qq))
    flops = 2.0 * args.p * args.n * (args.dk + args.dv) * 2  # read+count
    for name, fn in cands.items():
        try:
            print(f"compiling {name} ...")
            ms, (mem, cnt) = timeit(fn, kb, vb, valid, qb, iters=args.iters)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")
            continue
        err = float(np.abs(np.asarray(mem, np.float32) - ref_mem).max())
        cnt_d = float(np.abs(np.asarray(cnt, np.float32)
                             - np.asarray(ref_cnt, np.float32)).mean())
        print(f"{name:14s} {ms:8.2f} ms  {flops / ms / 1e9:7.1f} GFLOP/s  "
              f"max|mem-ref|={err:.4f}  mean|cnt-ref|={cnt_d:.3f}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
