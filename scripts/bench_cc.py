#!/usr/bin/env python
"""Microbench: device largest-connected-component cost at operating points.

The per-frame device CC cleanup is the biggest single cost in the fused
video step (p50 56 ms -> ~95 ms with CC in-graph). This times the op on
realistic mask types (smooth blob, noisy propagated, speckle worst-case)
at the 480p operating resolution and at half of it.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)


def masks_for(h, w, rng):
    smooth = np.zeros((h, w), np.uint8)
    smooth[h // 2:, :] = 1
    blobby = (np.cumsum(rng.randn(h, w), axis=0) > 0).astype(np.uint8)
    speckle = (rng.rand(h, w) > 0.5).astype(np.uint8)
    return {"smooth": smooth, "blobby": blobby, "speckle": speckle}


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.ops.cc import largest_connected_component

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    rng = np.random.RandomState(0)
    fn = jax.jit(largest_connected_component)
    from _bench_timing import timeit
    for (h, w) in [(480, 854), (240, 427)]:
        for name, m in masks_for(h, w, rng).items():
            x = jnp.asarray(m)
            out = fn(x)                      # sample output for `kept`
            ms = timeit(fn, x, iters=10)     # honest chained-carry timing
            print(f"largest_cc {h}x{w} {name:8s} {ms:7.2f} ms  "
                  f"kept={int(np.asarray(out).sum())}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
