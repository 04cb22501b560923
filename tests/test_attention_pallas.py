"""Pallas bank-read kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vfloodnet_tpu.ops.attention import _xla_read
from vfloodnet_tpu.ops.attention_pallas import pallas_bank_read


@pytest.mark.parametrize("n,p", [(512, 40), (1000, 30)])
def test_pallas_read_matches_xla(n, p):
    rng = np.random.RandomState(0)
    dk, dv = 16, 32
    keys = jnp.asarray(rng.randn(n, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(n, dv).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.25)
    q = jnp.asarray(rng.randn(p, dk).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        mem_p, cnt_p = pallas_bank_read(keys, values, valid, q, thres=1e-3,
                                        chunk=256)
    mem_r, cnt_r = _xla_read(keys, values, valid, q, 1e-3, 256)
    np.testing.assert_allclose(np.asarray(mem_p), np.asarray(mem_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cnt_p), np.asarray(cnt_r), atol=1.0)


def test_pallas_read_all_invalid_finite():
    rng = np.random.RandomState(1)
    n, dk, dv, p = 256, 8, 16, 10
    keys = jnp.asarray(rng.randn(n, dk).astype(np.float32))
    values = jnp.asarray(rng.randn(n, dv).astype(np.float32))
    q = jnp.asarray(rng.randn(p, dk).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        mem, cnt = pallas_bank_read(keys, values, jnp.zeros(n, bool), q,
                                    chunk=128)
    assert bool(jnp.isfinite(mem).all())
    assert float(cnt.sum()) == 0.0
