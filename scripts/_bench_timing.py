"""Shared chained-carry timing for device microbenches.

The axon relay dedupes repeated identical executions and resolves
``block_until_ready`` before remote completion, so back-to-back identical
calls measure ~0 ms. Feeding a scalar carry from each call into the next
forces true serialization; one ``float()`` at the end is the only D2H sync.
"""

import time


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return carry + sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    float(step(jnp.float32(0), *args))      # compile + warm
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(iters):
        c = step(c, *args)
    float(c)
    return (time.time() - t0) / iters * 1000.0
