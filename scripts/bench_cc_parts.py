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

    def masks_for(h, w, rng):
        speckle = (rng.rand(h, w) > 0.5).astype(np.uint8)
        blob = (np.cumsum(rng.randn(h, w), axis=0) > 0).astype(np.uint8)
        # production-shaped: one big water blob + a few tiny false blobs
        prod = np.zeros((h, w), np.uint8)
        prod[h // 2:, :] = 1
        for _ in range(6):
            y, x = rng.randint(0, h // 2), rng.randint(0, w - 8)
            prod[y:y + 4, x:x + 6] = 1
        return {"speckle": speckle, "blob": blob, "prod": prod}

    def size_count(labels):
        """The sort+run-length largest-label part of
        largest_connected_component, isolated."""
        h, w = labels.shape
        n = h * w
        flat = jnp.where(labels >= 0, labels, n).reshape(-1)
        s = jnp.sort(flat)
        pos = jnp.arange(n, dtype=jnp.int32)
        change = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        run_start = jax.lax.cummax(jnp.where(change, pos, 0))
        next_start = jax.lax.cummin(jnp.where(change, pos, n), reverse=True)
        run_end = jnp.concatenate([next_start[1:],
                                   jnp.full((1,), n, jnp.int32)])
        run_size = jnp.where(jnp.logical_and(change, s < n),
                             run_end - run_start, 0)
        return s[jnp.argmax(run_size)]

    def cc_iters(mask):
        """Converged sweep count of the fixpoint loop."""
        h, w = mask.shape
        fg = mask.astype(bool)
        init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
                + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
        init = jnp.where(fg, init, 2**30)

        def cond(st):
            labels, prev, it = st
            return jnp.logical_and(it < 64, jnp.any(labels != prev))

        def body(st):
            labels, _, it = st
            return cc._sweep(labels, fg), labels, it + 1

        first = cc._sweep(init, fg)
        _, _, it = jax.lax.while_loop(cond, body,
                                      (first, init, jnp.int32(1)))
        return it

    labels_fn = jax.jit(cc.connected_components)
    full = jax.jit(cc.largest_connected_component)
    sizes = jax.jit(size_count)
    sweep = jax.jit(cc._sweep)
    iters_fn = jax.jit(cc_iters)

    for (h, w) in [(240, 427), (480, 854)]:
        n = h * w
        rng = np.random.RandomState(0)
        print(f"--- {h}x{w} ({n/1e3:.0f}k px) ---")
        fg_s = jnp.asarray((rng.rand(h, w) > 0.5))
        init = jnp.where(fg_s, jnp.arange(n, dtype=jnp.int32).reshape(h, w),
                         2**30)
        print(f"one sweep            {timeit(sweep, init, fg_s):7.3f} ms")

        flat = jnp.arange(n, dtype=jnp.int32)
        idx = jnp.asarray(rng.randint(0, n, n).astype(np.int32))
        gather = jax.jit(lambda f, i: f[i])
        print(f"random gather        {timeit(gather, flat, idx):7.3f} ms")
        gsort = jax.jit(lambda f, i: jnp.sort(i))
        print(f"sort i32             {timeit(gsort, flat, idx):7.3f} ms")

        for name, m in masks_for(h, w, rng).items():
            x = jnp.asarray(m)
            it = int(iters_fn(x))
            t_lab = timeit(labels_fn, x, iters=5)
            lab = labels_fn(x)
            t_size = timeit(sizes, lab, iters=5)
            t_full = timeit(full, x, iters=5)
            print(f"{name:8s} iters={it:2d}  labels {t_lab:7.2f} ms  "
                  f"size-count {t_size:7.2f} ms  full {t_full:7.2f} ms")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
