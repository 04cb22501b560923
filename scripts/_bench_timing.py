"""Shared chained-carry timing for device microbenches.

The axon relay dedupes repeated identical executions and resolves
``block_until_ready`` before remote completion, so back-to-back identical
calls measure ~0 ms. (Verified round 3: a chained 8192^3 bf16 matmul
"measures" 0.04 ms under block_until_ready — 30 PFLOP/s, 150x chip peak —
while a forced scalar fetch shows the true ~5.5 ms ≈ 200 TFLOP/s.)
Feeding a carry from each call into the next forces true serialization;
one D2H fetch at the end is the only honest sync. Any timing that ends at
``block_until_ready`` measures dispatch, not compute.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.utils.profiling import force, fetch_floor  # noqa: F401



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
