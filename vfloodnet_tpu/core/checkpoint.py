"""Orbax checkpointing (replaces the reference's torch pickles,
train_video_seg.py:159-177)."""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


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
