"""Connected components / largest-component filtering on device.

TPU-native replacement for the reference's host-side OpenCV call
(``cv2.connectedComponentsWithAlgorithm`` in myutils/data.py:17-37): keeps the
mask device-resident between segmentation and estimation.

Algorithm: label-propagation union-find relaxation. Each foreground pixel is
seeded with its raster index; iterations alternate (a) 8-neighbour min-pool
and (b) full row/column cumulative-min sweeps in both directions, which
propagate labels along the whole row/column in one step. Convergence for
natural blob-shaped masks takes only a few sweeps; a ``lax.while_loop`` runs
until fixpoint.

Cost notes (TPU, 240x427, measured round 3 with forced-fetch timing): one
sweep ~2.9 ms before hoisting, production blob masks converge in 2 sweeps,
percolation speckle in ~15. The segment-id scans are loop-INVARIANT (they
depend only on ``fg``), so they are computed once outside the while_loop —
each sweep then costs 4 cummax + elementwise + 2 gathers instead of
4 (cumsum + cummax).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = 2**30  # python int: avoid creating device constants at import time


def _segment_encodings(fg: jnp.ndarray):
    """Per-direction segment encodings for the scanline cummin, hoisted out
    of the fixpoint loop (they depend only on the foreground mask).

    Returns {(axis, reverse): seg_scaled} with
    ``seg_scaled = segment_id * base`` — the additive offset that makes a
    single ``cummax`` act as a segmented max within runs of foreground.
    """
    h, w = fg.shape
    base = jnp.int32(h * w + 1)
    out = {}
    resets = (~fg).astype(jnp.int32)
    for axis in (0, 1):
        seg_f = jnp.cumsum(resets, axis=axis, dtype=jnp.int32)
        tot = jnp.take(seg_f, -1, axis=axis)
        seg_r = (jnp.expand_dims(tot, axis) - seg_f) + resets
        out[(axis, False)] = seg_f * base
        out[(axis, True)] = seg_r * base
    return out


def _sweep(labels: jnp.ndarray, fg: jnp.ndarray, seg_enc=None) -> jnp.ndarray:
    """One relaxation sweep: 8-neighbour min then 4-direction scanline cummin.

    ``seg_enc``: optional precomputed :func:`_segment_encodings` (the
    fixpoint loop passes it; standalone callers may omit it).
    """
    h, w = labels.shape
    big = jnp.where(fg, labels, _INF)

    # 8-neighbour min-pool (diagonals handle 8-connectivity).
    p = jnp.pad(big, 1, constant_values=_INF)
    neigh = jnp.minimum(
        jnp.minimum(jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
                    jnp.minimum(p[1:-1, :-2], p[1:-1, 2:])),
        jnp.minimum(jnp.minimum(p[:-2, :-2], p[:-2, 2:]),
                    jnp.minimum(p[2:, :-2], p[2:, 2:])),
    )
    big = jnp.minimum(big, jnp.where(fg, neigh, _INF))
    big = jnp.where(fg, big, _INF)

    # Scanline propagation: cumulative min along runs of foreground.
    # (Sequential per-direction updates converge in fewer sweeps than
    # batching all four directions against the same input — measured
    # equal per-iteration cost on TPU, so sequential wins.)
    # The offset encoding below needs (max line segments + 1) * base < 2^31
    # with base = h*w + 1 (segment ids count background pixels along the
    # scan line, so <= line length + 1). Static shape check; larger masks
    # (~>1M px) take the exact (value, reset)-pair associative_scan instead —
    # the encoding would silently wrap int32 and corrupt labels.
    offset_safe = (max(h, w) + 2) * (h * w + 1) < 2**31
    if offset_safe and seg_enc is None:
        seg_enc = _segment_encodings(fg)

    def run_cummin(x, axis, reverse):
        if not offset_safe:
            # Segmented cummin via associative_scan on (value, reset) pairs.
            def combine(a, b):
                av, ar = a
                bv, br = b
                v = jnp.where(br, bv, jnp.minimum(av, bv))
                return v, jnp.logical_or(ar, br)
            vals = jnp.where(fg, x, _INF)
            v, _ = jax.lax.associative_scan(combine, (vals, ~fg), axis=axis,
                                            reverse=reverse)
            return jnp.where(fg, v, _INF)
        # Segmented cummin (resets at background) via ONE native cummax of a
        # single int32 array — the segment-id offsets are precomputed once
        # per CC call (loop-invariant). Encoding:
        # enc = seg_id*base + (base-1-label); within a segment the cummax
        # selects the minimal label, and any earlier segment's enc is
        # strictly below the current segment's base.
        base = jnp.int32(h * w + 1)
        enc = seg_enc[(axis, reverse)] + (
            base - 1 - jnp.where(fg, x, base - 1).astype(jnp.int32))
        m = jax.lax.cummax(enc, axis=axis, reverse=reverse)
        dec = base - 1 - (m % base)
        return jnp.where(fg, jnp.minimum(x, dec), _INF)

    # Pointer jumping (union-find path shortcutting): a label is always the
    # raster index of a pixel in the same component, so L <- L[L] is safe and
    # contracts label chains geometrically — snake/percolation masks converge
    # in O(log diameter) sweeps instead of O(diameter). Jumps are a single
    # flat gather+min (cheap next to a log-depth scan), so they are
    # interleaved between the row and column scan phases: labels spread along
    # rows get shortcut before being spread down columns, which measurably
    # cuts the number of while-loop sweeps on maze/percolation masks.
    def gather_flat(flat, idx):
        """flat[idx] for s32 labels. On TPU an arbitrary 1-D gather lowers
        to a serial loop (profiled 0.43 ms at n=6360, the dominant sweep
        cost); decomposed as two one-hot contractions over a sqrt(n) x
        sqrt(n) layout it runs on the MXU/VPU in ~1/20th the time. Label
        values (< h*w) and _INF (a power of two) are f32-exact, and each
        row of the one-hot has exactly one nonzero, so the contraction is
        exact."""
        n = flat.shape[0]
        # bounds: below 1024 the native gather is fine; above ~16k the
        # [n, sqrt(n)] one-hot outgrows its win (the production CC grid is
        # the 1/8-scale 60x107 = 6360). VFLOOD_CC_GATHER=onehot|native
        # overrides (tests exercise the one-hot math on CPU with it).
        import os as _os
        impl = _os.environ.get("VFLOOD_CC_GATHER", "auto")
        use_onehot = impl == "onehot" or (
            impl == "auto" and jax.default_backend() == "tpu")
        if not use_onehot or not 1024 <= n <= 16384:
            return flat[idx]
        import math as _math
        c = int(_math.ceil(_math.sqrt(n)))
        vals = jnp.pad(flat, (0, c * c - n)).reshape(c, c)
        a = idx // c
        b = idx % c
        iota = jnp.arange(c, dtype=jnp.int32)
        rows = (a[:, None] == iota[None, :]).astype(jnp.float32)
        # precision=HIGHEST: the TPU matmul default truncates inputs to
        # bf16, which rounds label values > 256 (caught on-chip: one
        # flipped pixel on a speckle mask); the 3-pass f32-equivalent
        # mode keeps sub-2^24 integers exact.
        m1 = jax.lax.dot(rows, vals.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)  # [n, c]
        out = jnp.sum(m1 * (b[:, None] == iota[None, :]), axis=1)
        return out.astype(flat.dtype)

    def jump(x, times):
        flat = x.reshape(-1)
        for _ in range(times):
            idx = jnp.clip(flat, 0, h * w - 1)
            jumped = jnp.where(flat < _INF, gather_flat(flat, idx), _INF)
            flat = jnp.minimum(flat, jumped)
        return flat.reshape(h, w)

    # One jump after each scan phase (5 -> 2 jumps/sweep): jumps are flat
    # gathers, the costliest piece of a sweep, and the measured fixpoint
    # iteration count is the SAME with 1 jump as with 2+1 on both blob and
    # percolation masks — so fewer jumps is a straight ~2x sweep-cost win.
    for axis in (0, 1):
        for reverse in (False, True):
            big = jnp.minimum(big, run_cummin(big, axis, reverse))
        big = jump(jnp.where(fg, big, _INF), 1)
    return big


def connected_components(mask: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """Label 8-connected components of a binary mask.

    Returns int32 labels: background = -1, each component labelled by the
    raster index of its minimal pixel.
    """
    h, w = mask.shape
    fg = mask.astype(bool)
    init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    init = jnp.where(fg, init, _INF)

    offset_safe = (max(h, w) + 2) * (h * w + 1) < 2**31
    seg_enc = _segment_encodings(fg) if offset_safe else None

    def cond(state):
        labels, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(labels != prev))

    def body(state):
        labels, _, it = state
        new = _sweep(labels, fg, seg_enc)
        return new, labels, it + 1

    first = _sweep(init, fg, seg_enc)
    labels, _, _ = jax.lax.while_loop(cond, body, (first, init, jnp.int32(1)))
    return jnp.where(fg, labels, -1)


def largest_connected_component(mask: jnp.ndarray) -> jnp.ndarray:
    """Keep only the largest 8-connected foreground component.

    Behaviourally equivalent to the reference's ``postprocessing_pred``
    (myutils/data.py:17-37) for binary masks: the largest non-background
    component survives; everything else is zeroed. Returns uint8 {0,1}.
    """
    h, w = mask.shape
    n = h * w
    labels = connected_components(mask)
    flat = jnp.where(labels >= 0, labels, n).reshape(-1)
    # Largest component via sort + run-length, NOT a scatter-add histogram:
    # XLA lowers a 400k-bin random-index scatter to a painfully slow TPU
    # loop, while sort + cummax/cummin are log-depth and fast.
    s = jnp.sort(flat)                       # background (= n) sorts last
    pos = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    # start index of the run each position belongs to (prefix max of starts)
    run_start = jax.lax.cummax(jnp.where(change, pos, 0))
    # end index (exclusive): suffix min of the NEXT run's start
    next_start = jax.lax.cummin(
        jnp.where(change, pos, n), reverse=True)
    run_end = jnp.concatenate([next_start[1:], jnp.full((1,), n, jnp.int32)])
    run_size = jnp.where(jnp.logical_and(change, s < n),
                         run_end - run_start, 0)
    best = s[jnp.argmax(run_size)]
    return (labels == best).astype(jnp.uint8)
