"""Test configuration: run everything on a virtual 8-device CPU mesh.

The host image boots a TPU 'axon' PJRT plugin from sitecustomize at
interpreter start, which overrides JAX_PLATFORMS — but backends initialise
lazily, so switching the platform back to CPU via jax.config here (before any
device query) works. Multi-chip tests use the standard JAX fake-backend
pattern (8 virtual CPU devices); the reference has no test suite at all
(SURVEY.md §4), so this strategy is new.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
