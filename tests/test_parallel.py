"""Multi-chip tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.parallel import (make_mesh, sharded_bank_attention_read,
                                    MODEL_AXIS, DATA_AXIS)
from vfloodnet_tpu.ops.attention import _xla_read


def test_sharded_read_matches_single_device():
    mesh = make_mesh((1, 8))
    rng = np.random.RandomState(0)
    n, dk, dv, p = 512, 16, 24, 40
    keys = jnp.asarray(rng.randn(n, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(n, dv).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.3)
    q = jnp.asarray(rng.randn(p, dk).astype(np.float32))

    mem_s, cnt_s = sharded_bank_attention_read(mesh, keys, values, valid, q)
    mem_r, cnt_r = _xla_read(keys, values, valid, q, 1e-3, 512)

    np.testing.assert_allclose(np.asarray(mem_s), np.asarray(mem_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cnt_s), np.asarray(cnt_r), atol=1e-3)


def test_sharded_read_with_empty_shards():
    # All valid slots live on the first shard; others fully invalid.
    mesh = make_mesh((1, 8))
    rng = np.random.RandomState(1)
    n, dk, dv, p = 256, 8, 8, 10
    keys = jnp.asarray(rng.randn(n, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(n, dv).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < 20)
    q = jnp.asarray(rng.randn(p, dk).astype(np.float32))
    mem_s, cnt_s = sharded_bank_attention_read(mesh, keys, values, valid, q)
    mem_r, _ = _xla_read(keys, values, valid, q, 1e-3, 256)
    assert bool(jnp.isfinite(mem_s).all())
    np.testing.assert_allclose(np.asarray(mem_s), np.asarray(mem_r),
                               rtol=1e-4, atol=1e-5)
    assert float(cnt_s[20:].sum()) == 0.0


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = make_mesh((2, 4))
    assert m2.axis_names == (DATA_AXIS, MODEL_AXIS)
