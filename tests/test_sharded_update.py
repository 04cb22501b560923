"""Sharded bank update vs the single-device reference on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.ops.bank_update import bank_merge_append
from vfloodnet_tpu.parallel import make_mesh
from vfloodnet_tpu.parallel.sharded_update import sharded_bank_merge_append


def _setup(n=512, dk=16, dv=24, m=64, valid_n=100, seed=0):
    rng = np.random.RandomState(seed)
    keys = rng.randn(n, dk).astype(np.float32)
    values = rng.randn(n, dv).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:valid_n] = True
    birth = np.zeros(n, np.float32)
    usage = np.where(valid, rng.rand(n).astype(np.float32) * 5, 0.0)
    # make some new features merge-close to existing slots
    new_keys = rng.randn(m, dk).astype(np.float32)
    new_keys[: m // 4] = keys[: m // 4] * 1.7 + 0.001 * rng.randn(m // 4, dk)
    new_values = rng.randn(m, dv).astype(np.float32)
    return (keys, values, valid, birth, usage, new_keys, new_values)


def test_sharded_update_matches_reference_semantics():
    keys, values, valid, birth, usage, nk, nv = _setup()
    mesh = make_mesh((1, 8))

    rk, rv, rok, rb, ru, stats = bank_merge_append(
        jnp.asarray(keys), jnp.asarray(values), jnp.asarray(valid),
        jnp.asarray(birth), jnp.asarray(usage), jnp.asarray(nk),
        jnp.asarray(nv), jnp.float32(5.0))

    sk, sv, sok, sb, su, sev = sharded_bank_merge_append(
        mesh, jnp.asarray(keys), jnp.asarray(values), jnp.asarray(valid),
        jnp.asarray(birth), jnp.asarray(usage), jnp.asarray(nk),
        jnp.asarray(nv), 5.0)

    # identical number of live slots and identical merged slot contents
    assert int(jnp.sum(sok)) == int(jnp.sum(rok))
    assert int(sev) == 0          # plenty of free slots: nothing evicted
    # the merged slots (first m//4 were near-duplicates of slots 0..m//4)
    np.testing.assert_allclose(np.asarray(sk)[:16], np.asarray(rk)[:16],
                               rtol=1e-4, atol=1e-5)
    # every appended feature landed exactly once (same multiset of rows)
    appended_rows_ref = sorted(map(tuple, np.asarray(rk)[
        np.asarray(rb) == 5.0].round(4).tolist()))
    appended_rows_sh = sorted(map(tuple, np.asarray(sk)[
        np.asarray(sb) == 5.0].round(4).tolist()))
    assert appended_rows_ref == appended_rows_sh


def test_sharded_update_eviction_prefers_free_then_lfu():
    # full bank: lowest-usage slots must be overwritten
    n, dk, dv, m = 256, 8, 8, 16
    rng = np.random.RandomState(1)
    keys = rng.randn(n, dk).astype(np.float32)
    values = rng.randn(n, dv).astype(np.float32)
    valid = np.ones(n, bool)
    birth = np.zeros(n, np.float32)
    usage = np.linspace(1, 10, n).astype(np.float32)
    nk = rng.randn(m, dk).astype(np.float32) * 0.01  # orthogonal-ish, append
    nv = rng.randn(m, dv).astype(np.float32)

    mesh = make_mesh((1, 8))
    sk, sv, sok, sb, su, sev = sharded_bank_merge_append(
        mesh, jnp.asarray(keys), jnp.asarray(values), jnp.asarray(valid),
        jnp.asarray(birth), jnp.asarray(usage), jnp.asarray(nk),
        jnp.asarray(nv), 10.0)
    overwritten = np.nonzero(np.asarray(sb) == 10.0)[0]
    # victims must be among the globally lowest-usage slots
    assert len(overwritten) >= m - 4  # allow a few merges
    assert usage[overwritten].max() <= np.sort(usage)[m + 4]
    # every overwritten slot was valid -> counted as evicted
    assert int(sev) == len(overwritten)
