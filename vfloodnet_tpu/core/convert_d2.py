"""Detectron2 checkpoint -> Flax conversion for the detection models.

Maps the released COCO weights the reference points at
(estimation/object_detection.py:18,23 — PointRend X-101-32x8d and Keypoint
R-CNN R-101 ``model_final_*.pkl``) onto
:class:`vfloodnet_tpu.models.detection.GeneralizedRCNN` parameter names.

Detectron2 key layout (pickle {'model': {name: ndarray}}):
  backbone.bottom_up.stem.conv1.{weight,norm.*}
  backbone.bottom_up.res{2..5}.{i}.conv{1..3}.{weight,norm.*}
  backbone.bottom_up.res{2..5}.{i}.shortcut.{weight,norm.*}
  backbone.fpn_lateral{2..5}.{weight,bias}, backbone.fpn_output{2..5}.*
  proposal_generator.rpn_head.{conv,objectness_logits,anchor_deltas}.*
  roi_heads.box_head.fc{1,2}.*, roi_heads.box_predictor.{cls_score,bbox_pred}.*
  roi_heads.mask_head.mask_fcn{1..4}.*, .deconv.*, .predictor.*
  roi_heads.keypoint_head.conv_fcn{1..8}.*, .score_lowres.*
  (PointRend) roi_heads.mask_head.point_head.fc{1..3}.*, .predictor.*
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Mapping

import numpy as np

from .convert import torch_conv_to_flax, _set


def convert_d2_state_dict(sd: Mapping[str, np.ndarray],
                          with_masks: bool = False,
                          with_pointrend: bool = False,
                          with_keypoints: bool = False) -> Dict[str, Any]:
    """Convert a Detectron2 'model' dict to flax variables for
    GeneralizedRCNN. Unknown heads are skipped with a report."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    skipped = []

    def put_conv(fpath, w):
        _set(params, fpath + "/kernel", torch_conv_to_flax(np.asarray(w)))

    def put_norm(fpath, key, val):
        val = np.asarray(val)
        if key == "norm.weight":
            _set(params, fpath + "/scale", val)
        elif key == "norm.bias":
            _set(params, fpath + "/bias", val)
        elif key == "norm.running_mean":
            _set(stats, fpath + "/mean", val)
        elif key == "norm.running_var":
            _set(stats, fpath + "/var", val)

    for key, val in sd.items():
        val = np.asarray(val)
        if key.startswith("backbone.bottom_up.stem.conv1."):
            leaf = key.split("stem.conv1.")[1]
            if leaf == "weight":
                put_conv("backbone/stem_conv", val)
            else:
                put_norm("backbone/stem_bn", leaf, val)
            continue

        m = re.match(r"backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)"
                     r"\.(.+)", key)
        if m:
            stage, block, mod, leaf = m.groups()
            base = f"backbone/res{stage}_block{block}"
            fmod = {"conv1": "conv1", "conv2": "conv2", "conv3": "conv3",
                    "shortcut": "shortcut"}[mod]
            bn = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                  "shortcut": "shortcut_bn"}[mod]
            if leaf == "weight":
                put_conv(f"{base}/{fmod}", val)
            else:
                put_norm(f"{base}/{bn}", leaf, val)
            continue

        m = re.match(r"backbone\.fpn_(lateral|output)(\d)\.(weight|bias)", key)
        if m:
            kind, lvl, leaf = m.groups()
            fpath = f"fpn/{kind}{lvl}"
            if leaf == "weight":
                put_conv(fpath, val)
            else:
                _set(params, f"{fpath}/bias", val)
            continue

        m = re.match(r"proposal_generator\.rpn_head\.(conv|objectness_logits"
                     r"|anchor_deltas)\.(weight|bias)", key)
        if m:
            mod, leaf = m.groups()
            fmod = {"conv": "conv", "objectness_logits": "objectness",
                    "anchor_deltas": "deltas"}[mod]
            fpath = f"rpn/head/{fmod}"
            if leaf == "weight":
                put_conv(fpath, val)
            else:
                _set(params, f"{fpath}/bias", val)
            continue

        m = re.match(r"roi_heads\.box_head\.fc(\d)\.(weight|bias)", key)
        if m:
            idx, leaf = m.groups()
            fpath = f"box_head/fc{idx}"
            if leaf == "weight":
                # torch Linear [out, in] -> flax [in, out]
                _set(params, f"{fpath}/kernel", val.T)
            else:
                _set(params, f"{fpath}/bias", val)
            continue

        m = re.match(r"roi_heads\.box_predictor\.(cls_score|bbox_pred)"
                     r"\.(weight|bias)", key)
        if m:
            mod, leaf = m.groups()
            fpath = "box_head/" + ("cls" if mod == "cls_score" else "bbox")
            if leaf == "weight":
                _set(params, f"{fpath}/kernel", val.T)
            else:
                _set(params, f"{fpath}/bias", val)
            continue

        if with_masks:
            m = re.match(r"roi_heads\.mask_head\.mask_fcn(\d)\.(weight|bias)",
                         key)
            if m:
                idx, leaf = m.groups()
                fpath = f"mask_head/conv{int(idx) - 1}"
                if leaf == "weight":
                    put_conv(fpath, val)
                else:
                    _set(params, f"{fpath}/bias", val)
                continue
            if key.startswith("roi_heads.mask_head.deconv."):
                leaf = key.rsplit(".", 1)[1]
                if leaf == "weight":
                    # torch ConvTranspose [in, out, kh, kw] -> flax
                    # [kh, kw, in, out]
                    _set(params, "mask_head/deconv/kernel",
                         np.transpose(val, (2, 3, 0, 1)))
                else:
                    _set(params, "mask_head/deconv/bias", val)
                continue
            if key.startswith("roi_heads.mask_head.predictor."):
                leaf = key.rsplit(".", 1)[1]
                if leaf == "weight":
                    put_conv("mask_head/predictor", val)
                else:
                    _set(params, "mask_head/predictor/bias", val)
                continue

        if with_pointrend:
            m = re.match(r"roi_heads\.mask_head\.point_head\.fc(\d)"
                         r"\.(weight|bias)", key)
            if m:
                idx, leaf = m.groups()
                fpath = f"point_head/fc{int(idx) - 1}"
                if leaf == "weight":
                    _set(params, f"{fpath}/kernel",
                         val.T if val.ndim == 2 else
                         np.squeeze(val, -1).T)
                else:
                    _set(params, f"{fpath}/bias", val)
                continue
            if key.startswith("roi_heads.mask_head.point_head.predictor."):
                leaf = key.rsplit(".", 1)[1]
                if leaf == "weight":
                    _set(params, "point_head/predictor/kernel",
                         val.T if val.ndim == 2 else np.squeeze(val, -1).T)
                else:
                    _set(params, "point_head/predictor/bias", val)
                continue

        if with_keypoints:
            m = re.match(r"roi_heads\.keypoint_head\.conv_fcn(\d)"
                         r"\.(weight|bias)", key)
            if m:
                idx, leaf = m.groups()
                fpath = f"keypoint_head/conv{int(idx) - 1}"
                if leaf == "weight":
                    put_conv(fpath, val)
                else:
                    _set(params, f"{fpath}/bias", val)
                continue
            if key.startswith("roi_heads.keypoint_head.score_lowres."):
                leaf = key.rsplit(".", 1)[1]
                if leaf == "weight":
                    _set(params, "keypoint_head/deconv/kernel",
                         np.transpose(val, (2, 3, 0, 1)))
                else:
                    _set(params, "keypoint_head/deconv/bias", val)
                continue

        skipped.append(key)

    if skipped:
        print(f"convert_d2: skipped {len(skipped)} keys "
              f"(e.g. {skipped[:4]})")
    return {"params": params, "batch_stats": stats}


def convert_d2_checkpoint(path: str, **kwargs) -> Dict[str, Any]:
    with open(path, "rb") as f:
        blob = pickle.load(f, encoding="latin1")
    sd = blob.get("model", blob)
    return convert_d2_state_dict(sd, **kwargs)
