"""Sharded-bank scaling evidence on the virtual CPU mesh (VERDICT r2 #7).

The host has ONE physical core, so wall-clock on an 8-virtual-device mesh
cannot show a speedup (all virtual devices timeshare the core). What CAN be
measured honestly is the per-device WORK: XLA's cost analysis of the
compiled sharded executable reports flops/bytes per device, which must
scale as O(capacity / n_devices) for the bank-sharded read+update.

Prints a table of per-device flops for shards in {1, 2, 4, 8} at several
bank occupancies and asserts the ~1/n trend (within slack for the
replicated query-side work: scores are [N, P/n] but softmax/gather
epilogues are partly replicated).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/bench_sharded_scaling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")   # virtual-device CPU run

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vfloodnet_tpu.parallel import (make_mesh, sharded_bank_attention_read,
                                    sharded_bank_merge_append)  # noqa: E402


def per_device_flops(n_shards: int, capacity: int, occ_frac: float,
                     n_q: int = 4096, dk: int = 128, dv: int = 512) -> float:
    devices = jax.devices()[:n_shards]
    mesh = make_mesh((1, n_shards), devices=devices)
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randn(capacity, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(capacity, dv).astype(np.float32))
    valid = jnp.asarray(np.arange(capacity) < int(capacity * occ_frac))
    birth = jnp.zeros((capacity,))
    usage = jnp.where(valid, 1.0, 0.0)
    q = jnp.asarray(rng.randn(n_q, dk).astype(np.float32))
    nk = jnp.asarray(rng.randn(64, dk).astype(np.float32))
    nv = jnp.asarray(rng.randn(64, dv).astype(np.float32))

    def fused(keys, values, valid, birth, usage, q, nk, nv):
        mem, cnt = sharded_bank_attention_read(mesh, keys, values, valid, q)
        out = sharded_bank_merge_append(mesh, keys, values, valid, birth,
                                        usage, nk, nv, 2.0)
        return mem, cnt, out

    lowered = jax.jit(fused).lower(keys, values, valid, birth, usage,
                                   q, nk, nv)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def main():
    capacity = 16384
    shards = [1, 2, 4, 8]
    occs = [0.25, 0.5, 1.0]
    print(f"bank capacity {capacity}, q 4096x128, dv 512 "
          f"(per-DEVICE flops from XLA cost analysis)")
    print(f"{'occ':>5} " + " ".join(f"{f'n={n}':>12}" for n in shards)
          + f" {'n=1/n=8':>9}")
    worst_ratio = None
    for occ in occs:
        row = [per_device_flops(n, capacity, occ) for n in shards]
        ratio = row[0] / row[-1]
        worst_ratio = ratio if worst_ratio is None else min(worst_ratio,
                                                            ratio)
        print(f"{occ:5.2f} " + " ".join(f"{v / 1e6:11.1f}M" for v in row)
              + f" {ratio:8.2f}x")
    # O(capacity/n) trend: 8-way sharding must cut per-device work by >= 4x
    # (slack for the replicated epilogue; ideal is 8x).
    assert worst_ratio is not None and worst_ratio >= 4.0, (
        f"per-device work only dropped {worst_ratio:.2f}x from n=1 to n=8; "
        "expected O(capacity/n) scaling (>= 4x)")
    print(f"OK: per-device work scales O(capacity/n) "
          f"(n=1 -> n=8 cuts work {worst_ratio:.2f}x)")


if __name__ == "__main__":
    main()
