"""AFB-URR model graph tests on the CPU backend (small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.memory import FeatureBank


@pytest.fixture(scope="module")
def model_and_params():
    model = AFBURR(read_chunk=512)
    rng = jax.random.PRNGKey(0)
    frame = jnp.zeros((64, 48, 3))
    mask = jnp.zeros((2, 64, 48))
    variables = model.init(rng, frame, mask, method=model.init_all)
    return model, variables


def test_memorize_shapes(model_and_params):
    model, variables = model_and_params
    frame = jnp.asarray(np.random.RandomState(0).rand(64, 48, 3), jnp.float32)
    mask = jnp.zeros((2, 64, 48)).at[1, 20:40, 10:30].set(1.0)
    mask = mask.at[0].set(1.0 - mask[1])
    k4, v4 = model.apply(variables, frame, mask, method=model.memorize)
    assert k4.shape == (2, 4 * 3, 128)
    assert v4.shape == (2, 4 * 3, 512)
    assert bool(jnp.isfinite(k4).all()) and bool(jnp.isfinite(v4).all())


def test_segment_full_round_trip(model_and_params):
    model, variables = model_and_params
    rng = np.random.RandomState(1)
    frame0 = jnp.asarray(rng.rand(64, 48, 3), jnp.float32)
    mask0 = jnp.zeros((2, 64, 48)).at[1, 10:30, 10:30].set(1.0)
    mask0 = mask0.at[0].set(1.0 - mask0[1])

    fb = FeatureBank(obj_n=2, memory_budget=4096)
    k4, v4 = model.apply(variables, frame0, mask0, method=model.memorize)
    state = fb.init_bank(k4, v4)
    assert int(state.count()[0]) == 12

    frame1 = jnp.asarray(rng.rand(1, 64, 48, 3), jnp.float32)
    score, unc, cnt = model.apply(variables, frame1, state.keys, state.values,
                                  state.valid, False, method=model.segment)
    assert score.shape == (1, 2, 64, 48)
    assert unc is None
    assert cnt.shape == (2, fb.class_budget)
    assert bool(jnp.isfinite(score).all())

    # memorize predicted mask and update bank
    pred = jax.nn.softmax(score, axis=1)[0]
    k1, v1 = model.apply(variables, frame1[0], pred, method=model.memorize)
    state = fb.record_usage(state, cnt)
    state2 = fb.update(state, k1, v1, 1.0)
    assert int(state2.count()[0]) >= int(state.count()[0])
    # usage counts only land on valid slots
    assert bool(jnp.all(state2.usage[~state2.valid] == 0.0))


def test_segment_training_uncertainty(model_and_params):
    model, variables = model_and_params
    rng = np.random.RandomState(2)
    frame0 = jnp.asarray(rng.rand(64, 48, 3), jnp.float32)
    mask0 = jnp.zeros((2, 64, 48)).at[1, 5:25, 5:25].set(1.0)
    mask0 = mask0.at[0].set(1.0 - mask0[1])
    fb = FeatureBank(obj_n=2, memory_budget=4096)
    k4, v4 = model.apply(variables, frame0, mask0, method=model.memorize)
    state = fb.init_bank(k4, v4)

    frames = jnp.asarray(rng.rand(2, 64, 48, 3), jnp.float32)
    score, unc, _ = model.apply(variables, frames, state.keys, state.values,
                                state.valid, True, method=model.segment)
    assert score.shape == (2, 2, 64, 48)
    assert unc.shape == ()
    assert 0.0 <= float(unc) <= 1.01


def test_padding_of_non_multiple_of_16(model_and_params):
    model, variables = model_and_params
    frame0 = jnp.asarray(np.random.RandomState(3).rand(50, 70, 3), jnp.float32)
    mask0 = jnp.zeros((2, 50, 70)).at[1, 10:30, 10:30].set(1.0)
    mask0 = mask0.at[0].set(1.0 - mask0[1])
    fb = FeatureBank(obj_n=2, memory_budget=4096)
    k4, v4 = model.apply(variables, frame0, mask0, method=model.memorize)
    # padded to 64x80 -> P = 4*5 = 20
    assert k4.shape[1] == 20
    state = fb.init_bank(k4, v4)
    score, _, _ = model.apply(variables, frame0[None], state.keys,
                              state.values, state.valid, False,
                              method=model.segment)
    # output unpadded back to the input size
    assert score.shape == (1, 2, 50, 70)
