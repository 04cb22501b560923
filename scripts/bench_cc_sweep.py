#!/usr/bin/env python
"""In-graph decomposition of the CC sweep: fixed-trip fori_loops of each
sweep ingredient, ONE dispatch each (standalone microbench dispatches carry
a ~1-3 ms RPC floor that swamps ops this small — see docs/ROADMAP.md
day-7)."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

from _bench_timing import fetch_floor, force  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.ops import cc

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    K = 16

    for (h, w) in [(240, 427), (120, 214)]:
        n = h * w
        rng = np.random.RandomState(0)
        fg = jnp.asarray(rng.rand(h, w) > 0.5)
        init = jnp.where(fg, jnp.arange(n, dtype=jnp.int32).reshape(h, w),
                         2**30)
        seg_enc = cc._segment_encodings(fg)

        def loop(body):
            @jax.jit
            def run(x):
                return jax.lax.fori_loop(0, K, lambda i, v: body(v), x)
            return run

        def full_sweep(x):
            return cc._sweep(x, fg, seg_enc)

        def minpool(x):
            p = jnp.pad(jnp.where(fg, x, 2**30), 1, constant_values=2**30)
            m = jnp.minimum(
                jnp.minimum(jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
                            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:])),
                jnp.minimum(jnp.minimum(p[:-2, :-2], p[:-2, 2:]),
                            jnp.minimum(p[2:, :-2], p[2:, 2:])))
            return jnp.minimum(x, jnp.where(fg, m, 2**30))

        def one_jump(x):
            flat = x.reshape(-1)
            idx = jnp.clip(flat, 0, n - 1)
            flat = jnp.minimum(flat, jnp.where(flat < 2**30, flat[idx],
                                               2**30))
            return flat.reshape(h, w)

        base = jnp.int32(n + 1)

        def scan_axis(x, axis, reverse):
            enc = seg_enc[(axis, reverse)] + (
                base - 1 - jnp.where(fg, x, base - 1).astype(jnp.int32))
            m = jax.lax.cummax(enc, axis=axis, reverse=reverse)
            return jnp.where(fg, jnp.minimum(x, base - 1 - (m % base)),
                             2**30)

        def scans4(x):
            for axis in (0, 1):
                for rev in (False, True):
                    x = jnp.minimum(x, scan_axis(x, axis, rev))
            return x

        def scans_rows(x):
            for rev in (False, True):
                x = jnp.minimum(x, scan_axis(x, 1, rev))
            return x

        variants = [("full sweep", full_sweep), ("scans x4", scans4),
                    ("scans rows only", scans_rows), ("minpool", minpool),
                    ("one jump (gather)", one_jump)]
        print(f"--- {h}x{w}, fori_loop K={K} ---")
        for name, body in variants:
            run = loop(body)
            out = run(init)
            force(out)
            floor = fetch_floor(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                # chain rep inputs (out -> run(out)): identical re-dispatches
                # would be deduped by the relay; cost is data-independent
                # (fixed K trips) so the regime is unchanged
                out = run(out)
                force(out)
                best = min(best, time.time() - t0 - floor)
            print(f"{name:18s} {best / K * 1000:7.3f} ms/iter")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
