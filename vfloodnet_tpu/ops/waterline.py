"""Device-side mask -> waterline extraction.

Vectorised replacement for the reference's per-pixel Python column scan
(estimation/reference_tracking.py:197-204): for a given column and start row,
find the first row strictly below the start where the mask equals the water
label. Runs for all columns at once so the tracker loop reads one gathered
value per frame instead of scanning on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def waterline_scan(mask: jnp.ndarray, water_label: int = 1) -> jnp.ndarray:
    """For each column, the first row index where mask == water_label.

    Returns int32 [W]; columns with no water get H (one past the end).
    """
    h, w = mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    hit = mask == water_label
    first = jnp.min(jnp.where(hit, rows, h), axis=0)
    return first


def waterline_below(mask: jnp.ndarray, col: jnp.ndarray, start_row: jnp.ndarray,
                    water_label: int = 1) -> jnp.ndarray:
    """First water row in column ``col`` strictly below ``start_row`` (scalar).

    Returns int32; H if none. Mirrors reference_tracking.py:197-204 where the
    scan begins at ``key_pt[1] + 1``.
    """
    h, w = mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).squeeze(-1)
    column = mask[:, col]
    hit = jnp.logical_and(column == water_label, rows > start_row)
    return jnp.min(jnp.where(hit, rows, h))
