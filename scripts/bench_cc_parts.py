#!/usr/bin/env python
"""Microbench: cost decomposition of the device CC op on TPU.

Times (a) one relaxation sweep, (b) one 410k random gather (the pointer
jump), (c) full largest_cc with jumps every iteration vs no jumps, to find
where the 150 ms speckle-mask cost lives.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)


# honest chained-carry timing: repeated identical calls are deduped by the
# relay and block_until_ready is only a dispatch fence (_bench_timing.py)
from _bench_timing import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.ops import cc

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    h, w = 480, 854
    n = h * w
    rng = np.random.RandomState(0)
    speckle = (rng.rand(h, w) > 0.5).astype(np.uint8)
    fg = jnp.asarray(speckle.astype(bool))
    init = jnp.where(fg, jnp.arange(n, dtype=jnp.int32).reshape(h, w),
                     2**30)

    sweep = jax.jit(cc._sweep)
    print(f"one sweep            {timeit(sweep, init, fg):7.3f} ms")

    flat = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.asarray(rng.randint(0, n, n).astype(np.int32))

    gather = jax.jit(lambda f, i: f[i])
    print(f"random gather 410k   {timeit(gather, flat, idx):7.3f} ms")

    gsort = jax.jit(lambda f, i: jnp.sort(i))
    print(f"sort 410k i32        {timeit(gsort, flat, idx):7.3f} ms")

    take_sorted = jax.jit(lambda f, i: jnp.take(f, i, indices_are_sorted=True))
    sidx = jnp.sort(idx)
    print(f"sorted gather 410k   {timeit(take_sorted, flat, sidx):7.3f} ms")

    full = jax.jit(cc.largest_connected_component)
    print(f"largest_cc speckle   {timeit(full, jnp.asarray(speckle), iters=5):7.3f} ms")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
