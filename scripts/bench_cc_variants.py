#!/usr/bin/env python
"""Microbench: device largest-CC variants at the operating shape (half of
480x854 operating res = 240x427), on worst-case speckle and production-like
blob masks. Times the full largest_connected_component (labels + sort-based
size pick) plus variant sweeps, and reports fixpoint iteration counts.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_timing import timeit  # noqa: E402  (chained-carry device timing)

print = functools.partial(print, flush=True)

H, W = 240, 427
_INF = 2**30


def make_masks():
    rng = np.random.RandomState(0)
    speckle = (rng.rand(H, W) > 0.5).astype(np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    blob = (((yy - H * 0.6) ** 2 / (H * 0.4) ** 2
             + (xx - W * 0.5) ** 2 / (W * 0.45) ** 2) < 1.0).astype(np.uint8)
    blob[: H // 8] = 0
    noise = (rng.rand(H, W) > 0.995)
    blob = np.maximum(blob, noise.astype(np.uint8))
    return {"speckle": speckle, "blob": blob}


def variant_sweep(jump_row=2, jump_col=2, jump_final=1, seg_impl="pair"):
    """Parameterised copy of ops/cc.py::_sweep."""
    import jax
    import jax.numpy as jnp

    def _sweep(labels, fg):
        h, w = labels.shape
        big = jnp.where(fg, labels, _INF)
        p = jnp.pad(big, 1, constant_values=_INF)
        neigh = jnp.minimum(
            jnp.minimum(jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
                        jnp.minimum(p[1:-1, :-2], p[1:-1, 2:])),
            jnp.minimum(jnp.minimum(p[:-2, :-2], p[:-2, 2:]),
                        jnp.minimum(p[2:, :-2], p[2:, 2:])))
        big = jnp.minimum(big, jnp.where(fg, neigh, _INF))
        big = jnp.where(fg, big, _INF)

        def run_cummin_pair(x, axis, reverse):
            def combine(a, b):
                av, ar = a
                bv, br = b
                return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br
            vals = jnp.where(fg, x, _INF)
            v, _ = jax.lax.associative_scan(combine, (vals, ~fg), axis=axis,
                                            reverse=reverse)
            return jnp.where(fg, v, _INF)

        def run_cummin_offset(x, axis, reverse):
            # Segmented cummin via one cumsum + one cummax of single arrays:
            # value = seg_id*BASE + (BASE-1-label); within a segment the
            # cummax picks the min label, and any earlier segment's value is
            # strictly below the current segment's base.
            # int32 is safe: seg <= line length + 1 (<= 428) and
            # base = h*w+1 (~102k) -> enc < 44M << 2^31.
            base = jnp.int32(h * w + 1)
            resets = (~fg).astype(jnp.int32)
            seg = jnp.cumsum(resets, axis=axis, dtype=jnp.int32)
            if reverse:
                tot = jnp.take(seg, -1, axis=axis)
                seg = (jnp.expand_dims(tot, axis) - seg) + resets
            enc = seg * base + (base - 1 -
                                jnp.where(fg, x, base - 1).astype(jnp.int32))
            m = jax.lax.cummax(enc, axis=axis, reverse=reverse)
            dec = base - 1 - (m % base)
            return jnp.where(fg, jnp.minimum(x, dec), _INF)

        run_cummin = (run_cummin_pair if seg_impl == "pair"
                      else run_cummin_offset)

        def jump(x, times):
            flat = x.reshape(-1)
            for _ in range(times):
                idx = jnp.clip(flat, 0, h * w - 1)
                flat = jnp.minimum(flat, jnp.where(flat < _INF, flat[idx],
                                                   _INF))
            return flat.reshape(h, w)

        for axis, jn in ((0, jump_row), (1, jump_col)):
            for reverse in (False, True):
                big = jnp.minimum(big, run_cummin(big, axis, reverse))
            if jn:
                big = jump(jnp.where(fg, big, _INF), jn)
        if jump_final:
            big = jump(big, jump_final)
        return jnp.where(fg, big, _INF)

    return _sweep


def make_cc(sweep):
    import jax
    import jax.numpy as jnp

    def connected_components(mask, max_iters=64):
        h, w = mask.shape
        fg = mask.astype(bool)
        init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
                + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
        init = jnp.where(fg, init, _INF)

        def cond(state):
            labels, prev, it = state
            return jnp.logical_and(it < max_iters, jnp.any(labels != prev))

        def body(state):
            labels, _, it = state
            return sweep(labels, fg), labels, it + 1

        first = sweep(init, fg)
        labels, _, iters = jax.lax.while_loop(cond, body,
                                              (first, init, jnp.int32(1)))
        return jnp.where(fg, labels, -1), iters

    return connected_components


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu import ops
    from vfloodnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    masks = {k: jnp.asarray(v) for k, v in make_masks().items()}

    lcc = jax.jit(ops.largest_connected_component)
    for name, m in masks.items():
        print(f"current largest_cc [{name}]  {timeit(lcc, m):7.2f} ms")

    variants = {
        "pair j=2/2/1 (current)": variant_sweep(2, 2, 1, "pair"),
        "pair j=1/1/0": variant_sweep(1, 1, 0, "pair"),
        "pair j=0/0/0": variant_sweep(0, 0, 0, "pair"),
        "offset j=2/2/1": variant_sweep(2, 2, 1, "offset"),
        "offset j=1/1/0": variant_sweep(1, 1, 0, "offset"),
    }
    ref_cc = jax.jit(lambda m: ops.connected_components(m))
    for vname, sweep in variants.items():
        cc = jax.jit(make_cc(sweep), static_argnums=())
        for name, m in masks.items():
            labels, iters = cc(m)
            ok = bool(jnp.all(labels == ref_cc(m)))
            t = timeit(lambda x: cc(x)[0], m)
            print(f"{vname:24s} [{name:7s}] {t:7.2f} ms  "
                  f"iters={int(iters):2d} match={ok}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
