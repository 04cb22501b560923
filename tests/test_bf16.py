"""bf16 production path: numerics stay close to the f32 reference."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.ops.attention import _xla_read
from vfloodnet_tpu.pipelines.loaders import cast_floating_params


def test_attention_read_bf16_close_to_f32():
    rng = np.random.RandomState(0)
    n, dk, dv, p = 256, 16, 24, 40
    keys = rng.randn(n, dk).astype(np.float32)
    values = rng.randn(n, dv).astype(np.float32)
    valid = np.ones(n, bool)
    q = rng.randn(p, dk).astype(np.float32)

    mem32, cnt32 = _xla_read(jnp.asarray(keys), jnp.asarray(values),
                             jnp.asarray(valid), jnp.asarray(q), 1e-3, 64)
    mem16, cnt16 = _xla_read(jnp.asarray(keys, jnp.bfloat16),
                             jnp.asarray(values, jnp.bfloat16),
                             jnp.asarray(valid), jnp.asarray(q), 1e-3, 64)
    err = np.abs(np.asarray(mem16, np.float32) - np.asarray(mem32))
    scale = np.abs(np.asarray(mem32)).mean()
    assert err.mean() / scale < 0.05
    # usage counts stay within a few hits
    assert np.abs(np.asarray(cnt16) - np.asarray(cnt32)).mean() < 2.0


def test_afb_urr_bf16_mask_agreement():
    rng = np.random.RandomState(1)
    frame0 = jnp.asarray(rng.rand(64, 48, 3), jnp.float32)
    mask0 = jnp.zeros((2, 64, 48)).at[1, 16:48, 8:40].set(1.0)
    mask0 = mask0.at[0].set(1.0 - mask0[1])
    frame1 = jnp.asarray(rng.rand(1, 64, 48, 3), jnp.float32)

    preds = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = AFBURR(read_chunk=256, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((64, 48, 3)),
                               jnp.zeros((2, 64, 48)), method=model.init_all)
        if dtype == jnp.float32:
            variables_f32 = variables
        else:
            # same weights: reuse the f32 init (params stay f32; only
            # compute dtype differs)
            variables = variables_f32
        fb = FeatureBank(obj_n=2, memory_budget=2048, dtype=dtype)
        k4, v4 = model.apply(variables, frame0, mask0, method=model.memorize)
        state = fb.init_bank(k4, v4)
        score, _, _ = model.apply(variables, frame1, state.keys, state.values,
                                  state.valid, False, method=model.segment)
        preds[str(dtype.__name__)] = np.asarray(
            jnp.argmax(score, axis=1), np.uint8)

    a, b = preds["float32"], preds["bfloat16"]
    agreement = (a == b).mean()
    # Random-weight regime: the decoder's unbounded log-odds (see
    # models.afb_urr.Decoder) leave many genuine near-tie pixels where
    # bf16 noise can flip the argmax (the old 1e-7 prob clip used to
    # equalise them into deterministic ties, inflating agreement).
    # Trained-weight mask fidelity is covered by tests/test_demo_e2e.py.
    assert agreement > 0.95, agreement


def test_cast_floating_params_identity():
    """Pre-cast kernels (pipelines/loaders.py::cast_floating_params) must be
    BITWISE identical to flax's per-apply f32→bf16 promotion, and must leave
    1-D leaves (FrozenBN stats/affine, biases) in f32."""
    rng = np.random.RandomState(2)
    model = AFBURR(read_chunk=256, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((64, 48, 3)),
                           jnp.zeros((2, 64, 48)), method=model.init_all)
    cast = cast_floating_params(variables, jnp.bfloat16)

    leaves = jax.tree.leaves(cast)
    assert all(l.dtype == jnp.bfloat16 for l in leaves if l.ndim >= 2)
    assert all(l.dtype == jnp.float32 for l in leaves if l.ndim < 2)

    frame = jnp.asarray(rng.rand(64, 48, 3), jnp.float32)
    mask = jnp.zeros((2, 64, 48)).at[1, 16:48, 8:40].set(1.0)
    mask = mask.at[0].set(1.0 - mask[1])
    k_a, v_a = model.apply(variables, frame, mask, method=model.memorize)
    k_b, v_b = model.apply(cast, frame, mask, method=model.memorize)
    np.testing.assert_array_equal(np.asarray(k_a, np.float32),
                                  np.asarray(k_b, np.float32))
    np.testing.assert_array_equal(np.asarray(v_a, np.float32),
                                  np.asarray(v_b, np.float32))
