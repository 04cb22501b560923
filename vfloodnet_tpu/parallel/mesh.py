"""Device mesh setup.

The reference has no distributed execution at all (SURVEY.md §2.4); this
layer is new TPU-native design. Two logical axes:

- ``data``  — batch / clip parallelism (training, batch image seg).
- ``model`` — bank-capacity sharding for the memory read (the sequence /
  context-parallel analogue for video length) and channel sharding (TP).

Collectives ride ICI inside a slice via XLA (psum / all_gather inserted by
GSPMD or explicit in shard_map blocks).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
              devices=None) -> Mesh:
    """Create a 2-D mesh. Default shape: all devices on 'data' x 1 'model'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
