"""PyTorch -> Flax weight conversion.

One-time converters for the reference's released checkpoints so the TPU
framework reproduces its accuracy (SURVEY.md §5 "Checkpoint / resume"):

- AFB-URR video-seg checkpoint (dict with a ``model`` state_dict,
  train_video_seg.py:159-168; loaded strict=False at test_video_seg.py:51).
- LinkNet/EfficientNet-B4 image model (whole-model pickle,
  test_image_seg.py:133) — handled in :mod:`vfloodnet_tpu.models.linknet`
  conversion hooks.

No torch is required at inference time: conversion happens once and the
result is stored with orbax. torch (CPU) is only imported lazily here.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


_LAYER_MAP = {"res2": "layer1", "res3": "layer2", "res4": "layer3"}


def _map_resnet_key(rest: str) -> Dict[str, str]:
    """Map a torchvision-style resnet sub-key (within an encoder) to flax
    paths. Returns {} if not a resnet key."""
    m = re.match(r"(conv1|bn1)\.(.+)", rest)
    out = {}
    if m:
        mod, leaf = m.groups()
        out[f"{mod}.{leaf}"] = f"{mod}/{leaf}"
        return out
    m = re.match(r"(res2|res3|res4)\.(\d+)\.(.+)", rest)
    if m:
        layer, block, tail = m.groups()
        flax_layer = _LAYER_MAP[layer]
        tm = re.match(r"(conv\d|bn\d)\.(.+)", tail)
        if tm:
            mod, leaf = tm.groups()
            return {rest: f"{flax_layer}/block{block}/{mod}/{leaf}"}
        dm = re.match(r"downsample\.(\d)\.(.+)", tail)
        if dm:
            idx, leaf = dm.groups()
            mod = "downsample_conv" if idx == "0" else "downsample_bn"
            return {rest: f"{flax_layer}/block{block}/{mod}/{leaf}"}
    return out


def _leaf_convert(flax_path: str, leaf: str, w: np.ndarray):
    """Return (collection, final_path, array) for one torch leaf."""
    w = np.asarray(w)
    if leaf == "weight":
        if w.ndim == 4:
            return "params", flax_path.replace("/weight", "/kernel"), torch_conv_to_flax(w)
        # BN weight -> scale
        return "params", flax_path.replace("/weight", "/scale"), w
    if leaf == "bias":
        return "params", flax_path, w
    if leaf == "running_mean":
        return "batch_stats", flax_path.replace("/running_mean", "/mean"), w
    if leaf == "running_var":
        return "batch_stats", flax_path.replace("/running_var", "/var"), w
    if leaf == "num_batches_tracked":
        return None, None, None
    raise ValueError(f"unhandled leaf {leaf} at {flax_path}")


def convert_afb_urr_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference AFB-URR ``state_dict`` to flax variables
    {'params': ..., 'batch_stats': ...} matching
    :class:`vfloodnet_tpu.models.AFBURR`."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for key, value in sd.items():
        value = np.asarray(value)
        leaf = key.split(".")[-1]
        if leaf == "num_batches_tracked":
            continue
        if key.startswith(("encoder_m.", "encoder_q.")):
            enc, rest = key.split(".", 1)
            if rest in ("mean", "std"):   # registered normalisation buffers
                continue
            if rest.startswith(("conv1_m.", "conv1_o.")):
                mod, sub = rest.split(".", 1)
                flax_path = f"{enc}/{mod}/{sub}"
            else:
                mapped = _map_resnet_key(rest)
                if not mapped:
                    raise ValueError(f"unmapped encoder key: {key}")
                flax_path = f"{enc}/backbone/{list(mapped.values())[0]}"
        elif key.startswith("keyval_r4."):
            _, head, sub = key.split(".")
            flax_path = f"keyval_r4/{head.lower()}/{sub}"
        elif key.startswith("decoder."):
            flax_path = "decoder/" + key[len("decoder."):].replace(".", "/")
        else:
            raise ValueError(f"unmapped key: {key}")

        coll, final, arr = _leaf_convert(flax_path, leaf, value)
        if coll == "params":
            _set(params, final, arr)
        elif coll == "batch_stats":
            _set(stats, final, arr)

    return {"params": params, "batch_stats": stats}


def convert_afb_urr_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference training checkpoint (.pth: {'epoch','model',...},
    train_video_seg.py:159-168) or a bare state_dict and convert it."""
    import torch  # lazy; CPU-only usage

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_afb_urr_state_dict(sd)
