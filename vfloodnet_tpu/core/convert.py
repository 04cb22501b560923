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


# efficientnet-pytorch B4 block repeats (depth 1.8 over B0's [1,2,2,3,3,4,1])
# — the encoder's flat ``_blocks`` list maps to stage{si}_block{bi} names.
_B4_REPS = [2, 4, 4, 6, 6, 8, 2]
_ENC_SKIP_PREFIXES = ("_conv_head.", "_bn1.", "_fc.")   # head not in pyramid


def _map_smp_encoder_key(rest: str) -> str:
    """Map an efficientnet-pytorch sub-key (after ``encoder.``) to the flax
    path inside EfficientNetFeatures, or '' to skip."""
    if rest.startswith("_conv_stem."):
        return "encoder/stem_conv/" + rest.split(".", 1)[1]
    if rest.startswith("_bn0."):
        return "encoder/stem_bn/" + rest.split(".", 1)[1]
    if any(rest.startswith(p) for p in _ENC_SKIP_PREFIXES):
        return ""
    m = re.match(r"_blocks\.(\d+)\.(.+)", rest)
    if not m:
        raise ValueError(f"unmapped smp encoder key: {rest}")
    flat, tail = int(m.group(1)), m.group(2)
    si, bi, acc = 0, flat, 0
    for si, reps in enumerate(_B4_REPS):
        if flat < acc + reps:
            bi = flat - acc
            break
        acc += reps
    else:
        raise ValueError(f"block index {flat} beyond B4's "
                         f"{sum(_B4_REPS)} blocks")
    mod_map = {"_expand_conv": "expand_conv", "_bn0": "expand_bn",
               "_depthwise_conv": "dw_conv", "_bn1": "dw_bn",
               "_se_reduce": "se/reduce", "_se_expand": "se/expand",
               "_project_conv": "project_conv", "_bn2": "project_bn"}
    mod, leaf = tail.split(".", 1)
    if mod not in mod_map:
        raise ValueError(f"unmapped smp block module: {tail}")
    return f"encoder/stage{si}_block{bi}/{mod_map[mod]}/{leaf}"


def convert_smp_linknet_state_dict(sd: Mapping[str, np.ndarray]
                                   ) -> Dict[str, Any]:
    """Convert a reference smp ``Linknet(efficientnet-b4)`` state_dict
    (the whole-model pickle of test_image_seg.py:133 /
    train_image_seg.py:82-89) to flax variables for
    :class:`vfloodnet_tpu.models.linknet_smp.LinkNetSMP`.

    Decoder layout (smp LinknetDecoder): ``decoder.blocks.{j}.block`` is
    Sequential(Conv2dReLU, TransposeX2, Conv2dReLU), each a Sequential of
    (conv, bn, relu) — so ``.block.{0|1|2}.0`` is the conv and ``.{...}.1``
    the BN. The TransposeX2 weight [in, out, kH, kW] uses the SAME
    (2,3,1,0) permutation as a regular conv: the target kernel layout is
    [kH, kW, out, in] (models/linknet_smp.py::TorchConvTranspose2d).
    Encoder ``_conv_head``/top-level ``_bn1``/``_fc`` keys are skipped
    (not part of the feature pyramid).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    dec_mods = {"0": ("conv1", "bn1"), "1": ("tconv", "bn2"),
                "2": ("conv3", "bn3")}

    for key, value in sd.items():
        value = np.asarray(value)
        leaf = key.split(".")[-1]
        if leaf == "num_batches_tracked":
            continue
        if key.startswith("encoder."):
            flax_path = _map_smp_encoder_key(key[len("encoder."):])
            if not flax_path:
                continue
        elif key.startswith("decoder.blocks."):
            m = re.match(r"decoder\.blocks\.(\d)\.block\.([012])\.([01])\.(.+)",
                         key)
            if not m:
                raise ValueError(f"unmapped smp decoder key: {key}")
            j, seq, idx, sub = m.groups()
            mod = dec_mods[seq][int(idx)]
            flax_path = f"decoder/block{j}/{mod}/{sub}"
        elif key.startswith("segmentation_head.0."):
            flax_path = ("decoder/head/"
                         + key[len("segmentation_head.0."):])
        else:
            raise ValueError(f"unmapped smp key: {key}")

        coll, final, arr = _leaf_convert(flax_path, leaf, value)
        if coll == "params":
            _set(params, final, arr)
        elif coll == "batch_stats":
            _set(stats, final, arr)

    return {"params": params, "batch_stats": stats}


def convert_smp_linknet_pickle(path: str) -> Dict[str, Any]:
    """Load the reference's whole-model LinkNet pickle
    (``records/link_efficientb4_model.pth``, test_image_seg.py:133) or a
    bare state_dict and convert it."""
    import torch  # lazy; CPU-only usage

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.state_dict() if hasattr(blob, "state_dict") else blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_smp_linknet_state_dict(sd)


def convert_afb_urr_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference training checkpoint (.pth: {'epoch','model',...},
    train_video_seg.py:159-168) or a bare state_dict and convert it."""
    import torch  # lazy; CPU-only usage

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_afb_urr_state_dict(sd)
