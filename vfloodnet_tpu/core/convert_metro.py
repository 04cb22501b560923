"""METRO (MeshTransformer) checkpoint -> Flax weight conversion.

The reference people-depth path runs METRO in a subprocess
(estimation/object_detection.py:319-325) built from a state_dict
checkpoint (scripts/inference_bodymesh.py:295-298). This converter maps
that state_dict layout onto :class:`vfloodnet_tpu.models.metro.METRONetwork`:

torch key layout (METRO_Network, MeshTransformer):
  trans_encoder.{s}.bert.img_embedding.{weight,bias}
  trans_encoder.{s}.bert.position_embeddings.weight
  trans_encoder.{s}.bert.encoder.layer.{l}.attention.self.{query,key,value}.*
  trans_encoder.{s}.bert.encoder.layer.{l}.attention.output.dense.*
  trans_encoder.{s}.bert.encoder.layer.{l}.attention.output.LayerNorm.*
  trans_encoder.{s}.bert.encoder.layer.{l}.intermediate.dense.*
  trans_encoder.{s}.bert.encoder.layer.{l}.output.dense.*
  trans_encoder.{s}.bert.encoder.layer.{l}.output.LayerNorm.*
  trans_encoder.{s}.cls_head.* / trans_encoder.{s}.residual.*
  upsampling.* / upsampling2.*
  cam_param_fc.* / cam_param_fc2.* / cam_param_fc3.*
  backbone.{0,1,4,5,6,7}.*        (torchvision arch: Sequential(children[:-2]))

SMPL template buffers (template joints/vertices, H36M joint regressor) are
not part of the network state_dict — they come from the licensed SMPL data
files; pass them via ``smpl_buffers`` when available (synthetic arrays keep
the graph testable without them).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from .convert import _set, torch_conv_to_flax

_SEQ_TO_RESNET = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                  "6": "layer3", "7": "layer4"}

_BERT_SUB = {
    "attention.self.query": "attention/query",
    "attention.self.key": "attention/key",
    "attention.self.value": "attention/value",
    "attention.output.dense": "attention/out_dense",
    "attention.output.LayerNorm": "attention/out_ln",
    "intermediate.dense": "intermediate_dense",
    "output.dense": "output_dense",
    "output.LayerNorm": "output_ln",
}


def _dense(params, path, leaf, w):
    if leaf == "weight":
        _set(params, f"{path}/kernel", np.transpose(w))   # [out,in]->[in,out]
    else:
        _set(params, f"{path}/bias", w)


def _layernorm(params, path, leaf, w):
    _set(params, f"{path}/{'scale' if leaf == 'weight' else 'bias'}", w)


def _resnet_leaf(params, stats, flax_path, leaf, w):
    if leaf == "weight":
        if w.ndim == 4:
            _set(params, f"{flax_path}/kernel", torch_conv_to_flax(w))
        else:
            _set(params, f"{flax_path}/scale", w)
    elif leaf == "bias":
        _set(params, f"{flax_path}/bias", w)
    elif leaf == "running_mean":
        _set(stats, f"{flax_path}/mean", w)
    elif leaf == "running_var":
        _set(stats, f"{flax_path}/var", w)


def convert_metro_state_dict(sd: Mapping[str, np.ndarray],
                             smpl_buffers: Optional[Dict[str, np.ndarray]]
                             = None,
                             skip_backbone: bool = False) -> Dict[str, Any]:
    """Convert a METRO_Network state_dict to METRONetwork variables
    {'params', 'batch_stats', 'smpl'}.

    ``skip_backbone``: drop backbone.* keys (e.g. HRNet-w64 checkpoints —
    the TPU HRNet is a re-design, not weight-compatible; the transformer
    stages, upsampling and camera heads still convert).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmapped = []

    for key, value in sd.items():
        w = np.asarray(value)
        leaf = key.split(".")[-1]
        if leaf == "num_batches_tracked":
            continue

        m = re.match(r"trans_encoder\.(\d+)\.(.+)\.(weight|bias)$", key)
        if m:
            stage, rest, leaf = m.groups()
            base = f"stage{stage}"
            if rest == "bert.img_embedding":
                _dense(params, f"{base}/img_embedding", leaf, w)
            elif rest == "bert.position_embeddings":
                _set(params, f"{base}/position_embeddings", w)
            elif rest in ("cls_head", "residual"):
                _dense(params, f"{base}/{rest}", leaf, w)
            else:
                lm = re.match(r"bert\.encoder\.layer\.(\d+)\.(.+)$", rest)
                if lm and lm.group(2) in _BERT_SUB:
                    li, sub = lm.groups()
                    flax_sub = _BERT_SUB[sub]
                    path = f"{base}/layer{li}/{flax_sub}"
                    if flax_sub.endswith("_ln"):
                        _layernorm(params, path, leaf, w)
                    else:
                        _dense(params, path, leaf, w)
                else:
                    unmapped.append(key)
            continue

        m = re.match(r"(upsampling2?|cam_param_fc[23]?)\.(weight|bias)$", key)
        if m:
            _dense(params, m.group(1), m.group(2), w)
            continue

        if key.startswith("backbone."):
            if skip_backbone:
                continue
            m = re.match(r"backbone\.(\d+)\.(.*)$", key)
            if m and m.group(1) in _SEQ_TO_RESNET:
                mod = _SEQ_TO_RESNET[m.group(1)]
                rest = m.group(2)
                if not rest:
                    unmapped.append(key)
                    continue
                if mod in ("conv1", "bn1"):
                    flax_path = f"backbone/{mod}"
                    _resnet_leaf(params, stats, flax_path, leaf, w)
                    continue
                bm = re.match(r"(\d+)\.(.+)\.([^.]+)$", rest)
                if bm:
                    block, tail, leaf2 = bm.groups()
                    dm = re.match(r"downsample\.(\d)$", tail)
                    if dm:
                        sub = ("downsample_conv" if dm.group(1) == "0"
                               else "downsample_bn")
                    else:
                        sub = tail
                    _resnet_leaf(params, stats,
                                 f"backbone/{mod}/block{block}/{sub}",
                                 leaf2, w)
                    continue
            unmapped.append(key)
            continue

        unmapped.append(key)

    if unmapped:
        raise ValueError(f"unmapped METRO keys ({len(unmapped)}): "
                         f"{unmapped[:8]}...")

    smpl = {
        "template_joints": np.zeros((14, 3), np.float32),
        "template_vertices_sub2": np.zeros((431, 3), np.float32),
        "j_regressor_h36m": np.zeros((17, 6890), np.float32),
    }
    if smpl_buffers:
        smpl.update({k: np.asarray(v, np.float32)
                     for k, v in smpl_buffers.items()})
    return {"params": params, "batch_stats": stats, "smpl": smpl}
