#!/usr/bin/env python
"""Careful re-measure of device CC cost: distinct inputs per call, per-call
sync, and the actual while_loop iteration count. Resolves the contradiction
between bench_cc.py (154 ms speckle) and bench_cc_parts.py (0.06 ms)."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.ops import cc

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    h, w = 480, 854
    rng = np.random.RandomState(7)

    @jax.jit
    def cc_with_iters(mask):
        fg = mask.astype(bool)
        init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
                + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
        init = jnp.where(fg, init, cc._INF)

        def cond(state):
            labels, prev, it = state
            return jnp.logical_and(it < 64, jnp.any(labels != prev))

        def body(state):
            labels, _, it = state
            return cc._sweep(labels, fg), labels, it + 1

        first = cc._sweep(init, fg)
        labels, _, iters = jax.lax.while_loop(cond, body,
                                              (first, init, jnp.int32(1)))
        return labels, iters

    full = jax.jit(cc.largest_connected_component)

    for name, p in [("speckle.5", 0.5), ("speckle.7", 0.7),
                    ("blobby", None)]:
        masks = []
        for _ in range(6):
            if p is None:
                m = (np.cumsum(rng.randn(h, w), axis=0) > 0).astype(np.uint8)
            else:
                m = (rng.rand(h, w) > (1 - p)).astype(np.uint8)
            masks.append(jnp.asarray(m))
        # warm compile (force = honest sync; block_until_ready is a
        # dispatch fence only on the relay, _bench_timing.py)
        from _bench_timing import fetch_floor, force
        out = full(masks[0]); force(out)
        floor = fetch_floor(out)
        _, it = cc_with_iters(masks[0]); int(it)

        # per-call sync, distinct inputs
        ts = []
        for m in masks:
            t0 = time.time()
            out = full(m)
            force(out)
            ts.append(time.time() - t0 - floor)
        # iteration counts
        its = [int(cc_with_iters(m)[1]) for m in masks]
        # same-input async loop (old methodology) for comparison
        t0 = time.time()
        for _ in range(10):
            out = full(masks[0])
        jax.block_until_ready(out)
        loop_ms = (time.time() - t0) / 10 * 1000.0
        print(f"{name:10s} per-call {1000*np.median(ts):8.2f} ms  "
              f"async-loop {loop_ms:8.2f} ms  iters={its}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
