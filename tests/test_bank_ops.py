"""Unit tests for bank attention read and merge/append update vs numpy refs."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.ops.attention import bank_attention_read, _xla_read
from vfloodnet_tpu.ops.bank_update import bank_merge_append


def _np_attention(keys, values, valid, q, thres):
    # Reference semantics: p = softmax over bank dim of K q^T / sqrt(dk)
    dk = keys.shape[1]
    s = (q @ keys.T) / np.sqrt(dk)          # [P, N]
    s[:, ~valid] = -1e30
    s = s - s.max(axis=1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=1, keepdims=True)
    mem = p @ values                        # [P, dv]
    cnt = (p > thres).sum(axis=0).astype(np.float32)
    cnt[~valid] = 0.0
    return mem, cnt


def test_attention_read_matches_numpy():
    rng = np.random.RandomState(0)
    n, dk, dv, p_n = 300, 16, 24, 50
    keys = rng.randn(n, dk).astype(np.float32)
    values = rng.randn(n, dv).astype(np.float32)
    valid = rng.rand(n) > 0.3
    q = rng.randn(p_n, dk).astype(np.float32)

    mem, cnt = bank_attention_read(jnp.asarray(keys), jnp.asarray(values),
                                   jnp.asarray(valid), jnp.asarray(q),
                                   thres=1e-3, chunk=64, impl="xla")
    ref_mem, ref_cnt = _np_attention(keys, values, valid, q, 1e-3)
    np.testing.assert_allclose(np.asarray(mem), ref_mem, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cnt), ref_cnt, atol=1.0)


def test_attention_read_chunking_invariance():
    rng = np.random.RandomState(1)
    n, dk, dv, p_n = 200, 8, 12, 30
    keys = jnp.asarray(rng.randn(n, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(n, dv).astype(np.float32))
    valid = jnp.asarray(np.ones(n, bool))
    q = jnp.asarray(rng.randn(p_n, dk).astype(np.float32))
    m1, c1 = _xla_read(keys, values, valid, q, 1e-3, 17)
    m2, c2 = _xla_read(keys, values, valid, q, 1e-3, 200)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-3)


def test_bank_update_merges_close_features():
    rng = np.random.RandomState(2)
    n, dk, dv = 64, 8, 12
    keys = np.zeros((n, dk), np.float32)
    values = np.zeros((n, dv), np.float32)
    valid = np.zeros(n, bool)
    keys[0] = [1, 0, 0, 0, 0, 0, 0, 0]
    values[0] = rng.randn(dv)
    valid[0] = True
    birth = np.zeros(n, np.float32)
    usage = np.zeros(n, np.float32)

    # One new feature nearly identical to slot 0 -> merge; one orthogonal -> append.
    new_keys = np.stack([
        np.array([0.999, 0.03, 0, 0, 0, 0, 0, 0], np.float32) * 3.0,
        np.array([0, 1, 0, 0, 0, 0, 0, 0], np.float32),
    ])
    new_values = rng.randn(2, dv).astype(np.float32)

    k, v, ok, b, u, stats = bank_merge_append(
        jnp.asarray(keys), jnp.asarray(values), jnp.asarray(valid),
        jnp.asarray(birth), jnp.asarray(usage),
        jnp.asarray(new_keys), jnp.asarray(new_values), jnp.float32(1.0),
        update_rate=0.1, thres_close=0.95)

    assert int(stats.merged_n) == 1
    assert int(stats.appended_n) == 1
    assert int(stats.evicted_n) == 0
    assert int(jnp.sum(ok)) == 2
    # Merged slot: magnitude preserved (norm stays ~1), direction EMA'd.
    k0 = np.asarray(k)[0]
    np.testing.assert_allclose(np.linalg.norm(k0), 1.0, rtol=1e-4)
    expected_dir = 0.9 * np.array([1, 0, 0, 0, 0, 0, 0, 0]) + \
        0.1 * new_keys[0] / np.linalg.norm(new_keys[0])
    np.testing.assert_allclose(k0, expected_dir, atol=1e-4)


def test_bank_update_evicts_lfu_when_full():
    n, dk, dv = 4, 4, 4
    rng = np.random.RandomState(3)
    keys = np.eye(4, dtype=np.float32)
    values = rng.randn(n, dv).astype(np.float32)
    valid = np.ones(n, bool)
    birth = np.zeros(n, np.float32)
    usage = np.array([5.0, 1.0, 8.0, 3.0], np.float32)  # slot 1 least used

    new_keys = np.array([[0.5, 0.5, 0.5, 0.5]], np.float32)  # orthogonal-ish
    new_values = rng.randn(1, dv).astype(np.float32)

    k, v, ok, b, u, stats = bank_merge_append(
        jnp.asarray(keys), jnp.asarray(values), jnp.asarray(valid),
        jnp.asarray(birth), jnp.asarray(usage),
        jnp.asarray(new_keys), jnp.asarray(new_values), jnp.float32(10.0),
        update_rate=0.1, thres_close=0.95)

    assert int(stats.appended_n) == 1
    assert int(stats.evicted_n) == 1
    # Slot 1 (lowest usage/age) was overwritten with the new key.
    np.testing.assert_allclose(np.asarray(k)[1], new_keys[0], rtol=1e-5)
    assert float(u[1]) == 0.0
    assert float(b[1]) == 10.0


def test_bank_update_jits_without_recompile():
    n, dk, dv, m = 128, 8, 8, 16
    rng = np.random.RandomState(4)
    f = jax.jit(lambda *a: bank_merge_append(*a, update_rate=0.1,
                                             thres_close=0.95))
    keys = jnp.asarray(rng.randn(n, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(n, dv).astype(np.float32))
    valid = jnp.asarray(np.zeros(n, bool)).at[:8].set(True)
    birth = jnp.zeros(n)
    usage = jnp.zeros(n)
    for i in range(3):
        nk = jnp.asarray(rng.randn(m, dk).astype(np.float32))
        nv = jnp.asarray(rng.randn(m, dv).astype(np.float32))
        keys, values, valid, birth, usage, _ = f(keys, values, valid, birth,
                                                 usage, nk, nv,
                                                 jnp.float32(i + 1))
    assert f._cache_size() == 1


def test_feature_bank_append_api():
    from vfloodnet_tpu.memory import FeatureBank
    rng = np.random.RandomState(9)
    fb = FeatureBank(obj_n=2, memory_budget=1024, keydim=8, valdim=8)
    k0 = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    v0 = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    state = fb.init_bank(k0, v0)
    k1 = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    v1 = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    state2 = fb.append(state, k1, v1, frame_idx=3.0)
    assert int(state2.count()[0]) == 24
    # appended slots carry the reference's usage bootstrap of 20
    new_mask = np.asarray(state2.birth[0]) == 3.0
    assert new_mask.sum() == 8
    assert (np.asarray(state2.usage[0])[new_mask] == 20.0).all()


# ---- Occupancy-bounded (dense-prefix) paths --------------------------------

def test_attention_read_occ_bound_matches_full():
    """The occupancy-bounded loop read must equal the full read when all
    valid slots sit below occ_bound (dense-prefix invariant)."""
    from vfloodnet_tpu.ops.attention import _xla_read_dense, _xla_read_occ
    rng = np.random.RandomState(5)
    n, dk, dv, p_n, occ = 20000, 16, 24, 40, 300
    keys = jnp.asarray(rng.randn(n, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(n, dv).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < occ)
    q = jnp.asarray(rng.randn(p_n, dk).astype(np.float32))
    m_full, c_full = _xla_read_dense(keys, values, valid, q, 1e-3)
    m_occ, c_occ = _xla_read_occ(keys, values, valid, q, 1e-3, 8192,
                                 jnp.int32(occ))
    np.testing.assert_allclose(np.asarray(m_occ), np.asarray(m_full),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_occ), np.asarray(c_full),
                               atol=1.0)
    # A loose bound (over-estimate) is still exact: validity masks the rest.
    m_loose, c_loose = _xla_read_occ(keys, values, valid, q, 1e-3, 8192,
                                     jnp.int32(occ + 9000))
    np.testing.assert_allclose(np.asarray(m_loose), np.asarray(m_full),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_loose), np.asarray(c_full),
                               atol=1.0)


def test_attention_read_occ_bf16_close_to_f32():
    """The occ-bounded read keeps bf16 [P, chunk] intermediates for bf16
    banks (HBM-traffic trade, same as the dense path) — results must stay
    within the documented bf16 production tolerance of the f32 path."""
    from vfloodnet_tpu.ops.attention import _xla_read_dense, _xla_read_occ
    rng = np.random.RandomState(7)
    n, dk, dv, p_n, occ = 20000, 16, 24, 40, 9000
    keys = rng.randn(n, dk).astype(np.float32)
    values = rng.randn(n, dv).astype(np.float32)
    valid = jnp.asarray(np.arange(n) < occ)
    q = jnp.asarray(rng.randn(p_n, dk).astype(np.float32))
    m32, c32 = _xla_read_dense(jnp.asarray(keys), jnp.asarray(values),
                               valid, q, 1e-3)
    m16, c16 = _xla_read_occ(jnp.asarray(keys, jnp.bfloat16),
                             jnp.asarray(values, jnp.bfloat16),
                             valid, q, 1e-3, 8192, jnp.int32(occ))
    err = np.abs(np.asarray(m16, np.float32) - np.asarray(m32))
    scale = np.abs(np.asarray(m32)).mean()
    assert err.mean() / scale < 0.05
    assert np.abs(np.asarray(c16) - np.asarray(c32)).mean() < 2.0


def test_best_match_occ_bf16_close_to_f32():
    """bf16 correlation intermediates in the occ-bounded match: best-match
    indices must agree with the f32 path for all but borderline ties."""
    from vfloodnet_tpu.ops.bank_update import (_best_match, _best_match_occ,
                                               _safe_normalize)
    rng = np.random.RandomState(8)
    n, d, m, occ = 20000, 16, 64, 9000
    keys = rng.randn(n, d).astype(np.float32)
    valid = jnp.asarray(np.arange(n) < occ)
    mag = jnp.linalg.norm(jnp.asarray(keys), axis=1)
    new, _ = _safe_normalize(jnp.asarray(rng.randn(m, d).astype(np.float32)))
    c32, i32 = _best_match(jnp.asarray(keys), mag, valid, new, 4096)
    c16, i16 = _best_match_occ(jnp.asarray(keys, jnp.bfloat16), valid,
                               new.astype(jnp.bfloat16), jnp.int32(occ))
    assert (np.asarray(i16) == np.asarray(i32)).mean() > 0.9
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32),
                               rtol=0.02, atol=0.02)


def test_best_match_occ_matches_full():
    from vfloodnet_tpu.ops.bank_update import (_best_match, _best_match_occ,
                                               _safe_normalize)
    rng = np.random.RandomState(6)
    n, d, m, occ = 20000, 16, 64, 500
    keys = jnp.asarray(rng.randn(n, d).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < occ)
    mag = jnp.linalg.norm(keys, axis=1)
    new, _ = _safe_normalize(jnp.asarray(rng.randn(m, d).astype(np.float32)))
    c_full, i_full = _best_match(keys, mag, valid, new, 4096)
    c_occ, i_occ = _best_match_occ(keys, valid, new, jnp.int32(occ))
    np.testing.assert_allclose(np.asarray(c_occ), np.asarray(c_full),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_occ), np.asarray(i_full))


def _prefix_ok(state):
    occ = np.asarray(state.occ)
    valid = np.asarray(state.valid)
    cap = valid.shape[1]
    for o in range(valid.shape[0]):
        expect = np.arange(cap) < occ[o]
        if not (valid[o] == expect).all():
            return False
    return True


def test_feature_bank_dense_prefix_invariant():
    """init/update/append all keep valid slots densely packed at [0, occ)."""
    from vfloodnet_tpu.memory import FeatureBank
    rng = np.random.RandomState(7)
    fb = FeatureBank(obj_n=2, memory_budget=512, keydim=8, valdim=8)
    k0 = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    v0 = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    state = fb.init_bank(k0, v0)
    assert _prefix_ok(state)
    assert (np.asarray(state.occ) == 16).all()
    for i in range(4):
        nk = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
        nv = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
        state = fb.update(state, nk, nv, float(i + 1))
        assert _prefix_ok(state)
        assert (np.asarray(state.occ) ==
                np.asarray(state.count())).all()
    state = fb.append(state, k0, v0, frame_idx=9.0)
    assert _prefix_ok(state)


def test_feature_bank_occ_saturates_and_evicts():
    """Random orthogonal-ish features overflow the tiny bank: occ pins at
    capacity and evictions are recorded, prefix invariant intact."""
    from vfloodnet_tpu.memory import FeatureBank
    rng = np.random.RandomState(8)
    fb = FeatureBank(obj_n=2, memory_budget=256, keydim=8, valdim=8)
    cap = fb.class_budget
    state = fb.init_bank(
        jnp.asarray(rng.randn(2, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 16, 8).astype(np.float32)))
    for i in range(6):
        nk = jnp.asarray(rng.randn(2, 48, 8).astype(np.float32))
        nv = jnp.asarray(rng.randn(2, 48, 8).astype(np.float32))
        state = fb.update(state, nk, nv, float(i + 1))
        assert _prefix_ok(state)
    assert (np.asarray(state.occ) == cap).all()
    assert (np.asarray(state.replace_n) > 0).all()
