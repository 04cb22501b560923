"""Model construction + checkpoint loading helpers for the CLIs."""

from __future__ import annotations

import os
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import convert_afb_urr_checkpoint
from ..core.checkpoint import restore_checkpoint
from ..models import AFBURR
from ..utils import gct

# In-repo trained demo checkpoints (scripts/train_demo_checkpoints.py) —
# used when no explicit model path is given, replacing random-init smoke
# mode everywhere (the reference loads its released .pth the same way,
# test_video_seg.py:48-58; those files cannot be downloaded here).
_RECORDS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "records", "checkpoints")


def default_checkpoint(kind: str) -> Optional[str]:
    """Path of the bundled trained checkpoint for ``kind`` in
    {'video', 'image', 'stopsign_tiny'}, or None if absent. Prefers the
    flat ``best.npz`` fast-load file (seconds) over an orbax ``best/`` dir
    (~4 min restore on this host — see core/checkpoint.py)."""
    npz = os.path.join(_RECORDS, kind, "best.npz")
    if os.path.exists(npz):
        return npz
    path = os.path.join(_RECORDS, kind, "best")
    return path if os.path.isdir(path) else None


def load_afb_urr(model_path: Optional[str] = None,
                 dtype=jnp.float32) -> Tuple[AFBURR, dict]:
    """Build the AFB-URR model and load weights.

    Accepts either a converted orbax checkpoint directory, a reference
    PyTorch ``.pth`` checkpoint (converted on the fly via torch-cpu), or
    None (fall back to the bundled demo checkpoint, then random init with
    a warning — functional smoke mode only).
    """
    model = AFBURR(dtype=dtype)
    if model_path is None:
        model_path = default_checkpoint("video")
    elif not os.path.exists(model_path):
        # CLI defaults name the converted-reference-weights location
        # (e.g. est_waterlevel.py records/video_seg_tpu); when absent,
        # prefer the bundled trained demo checkpoint over random init.
        bundled = default_checkpoint("video")
        if bundled:
            warnings.warn(f"No checkpoint at {model_path!r}; using bundled "
                          f"demo checkpoint {bundled!r}.")
            model_path = bundled

    def _random_init():
        rng = jax.random.PRNGKey(0)
        frame = jnp.zeros((64, 64, 3))
        mask = jnp.zeros((2, 64, 64))
        return model.init(rng, frame, mask, method=model.init_all)

    if model_path and os.path.exists(model_path):
        if model_path.endswith(".pth") or model_path.endswith(".bin"):
            print(gct(), f"Converting PyTorch checkpoint {model_path}")
            variables = convert_afb_urr_checkpoint(model_path)
            variables = jax.tree.map(jnp.asarray, variables)
        elif model_path.endswith(".npz"):
            # fast path: no target tree, no model.init (which would itself
            # cold-compile on a TPU backend), one sequential read
            from ..core.checkpoint import load_flat_npz
            print(gct(), f"Loading npz checkpoint {model_path}")
            variables = load_flat_npz(model_path)
        else:
            print(gct(), f"Restoring checkpoint {model_path}")
            variables = restore_checkpoint(model_path,
                                           target=jax.tree.map(
                                               lambda x: x, _random_init()))
        print(gct(), f"Loaded checkpoint {model_path}")
    else:
        warnings.warn(f"No checkpoint found at {model_path!r}; "
                      "using random initialisation (smoke mode).")
        variables = _random_init()
    return model, variables


def cast_floating_params(variables, dtype):
    """Pre-cast conv/dense kernels (floating leaves with ndim >= 2) to the
    compute ``dtype`` — once, at engine build.

    Flax promotes kernels to the module's compute dtype inside every apply
    (``flax.linen.dtypes.promote_dtype``), so for a bf16 inference engine
    this is numerically identical while halving the per-step weight HBM
    read (the f32 masters stay with the caller for checkpointing/training).
    1-D leaves — biases, FrozenBN scale/bias/running stats — are kept f32:
    FrozenBN deliberately normalises in f32 (models/resnet.py:22-36), and
    they are a negligible fraction of the weight bytes.
    """
    def _cast(x):
        x = jnp.asarray(x)
        if x.ndim >= 2 and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(_cast, variables)
