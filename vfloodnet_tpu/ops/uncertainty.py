"""Uncertainty measure for URR (uncertainty-based region refinement).

Equivalent computation to the reference's ``calc_uncertainty``
(myutils/data.py:40-46): ratio of top-1 to top-2 object scores, mapped through
exp(1 - ratio) so confident pixels -> ~0, ambiguous pixels -> ~1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_uncertainty(score: jnp.ndarray, obj_axis: int = -1) -> jnp.ndarray:
    """score: object-probability map; returns uncertainty with obj axis kept=1.

    Works for any layout; default NHWC-style with the object axis last.
    """
    top2 = jax.lax.top_k(jnp.moveaxis(score, obj_axis, -1), 2)[0]
    unc = top2[..., 0] / (top2[..., 1] + 1e-8)
    unc = jnp.exp(1.0 - unc)
    return jnp.expand_dims(unc, obj_axis)
