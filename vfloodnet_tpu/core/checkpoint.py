"""Checkpoint IO (replaces the reference's torch pickles,
train_video_seg.py:159-177).

Two formats:

- orbax (``save_checkpoint``/``restore_checkpoint``): the durable training
  format (sharded arrays, async write).
- flat ``.npz`` (``save_flat_npz``/``load_flat_npz``): the fast inference
  format. Restoring the bundled 280 MB video checkpoint through orbax on
  this host costs ~4 minutes and needs a target tree (i.e. a model.init —
  an extra cold compile on a TPU backend); a flat npz is one sequential
  read, needs no target, and loads in seconds. Benches and CLIs load
  weights through this path.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp

# Separates nested-dict path segments inside npz keys. '/' is safe: flax
# param names never contain it.
_SEP = "/"


def save_checkpoint(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if target is not None:
        return ckpt.restore(path, target=target)
    return ckpt.restore(path)


def restore_as_numpy(path: str) -> Dict[str, Any]:
    """Restore an orbax checkpoint as host numpy arrays, on any backend,
    with no target tree. Builds the tree structure from the checkpoint's
    own ``_METADATA`` key list, so it works even when the checkpoint was
    saved with device shardings that don't exist in this process (e.g. a
    TPU-saved checkpoint opened on CPU)."""
    import ast
    import json

    path = os.path.abspath(path)
    with open(os.path.join(path, "_METADATA")) as f:
        tree_meta = json.load(f)["tree_metadata"]
    restore_args: Dict[str, Any] = {}
    for key in tree_meta:
        parts = ast.literal_eval(key)
        node = restore_args
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = ocp.RestoreArgs(restore_type=np.ndarray)
    return ocp.PyTreeCheckpointer().restore(path, restore_args=restore_args)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def save_flat_npz(path: str, tree: Any) -> None:
    """Write a (nested-dict) pytree of arrays as one uncompressed npz with
    '/'-joined path keys. Uncompressed: weights are incompressible float
    data and np.load memory-maps cleanly."""
    flat = _flatten(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_flat_npz(path: str) -> Dict[str, Any]:
    """Inverse of :func:`save_flat_npz`: rebuild the nested dict. Leaves are
    host numpy arrays (jit transfers them on first use; callers that reuse
    the tree across many steps should ``jax.device_put`` it once)."""
    out: Dict[str, Any] = {}
    with np.load(path) as blob:
        for key in blob.files:
            node = out
            parts = key.split(_SEP)
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = blob[key]
    return out
