"""Orbax checkpoint round-trip for model variables and train state."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from vfloodnet_tpu.models import LinkNet
from vfloodnet_tpu.train import ImageTrainConfig, init_image_train_state


def test_variables_round_trip(tmp_path):
    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, variables)
    restored = restore_checkpoint(path, target=variables)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_round_trip(tmp_path):
    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    state, _ = init_image_train_state(model, variables, ImageTrainConfig(), 10)
    state = state.replace(step=jnp.int32(7))
    path = str(tmp_path / "train_ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, target=state)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
