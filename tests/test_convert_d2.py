"""Detectron2 converter: synthetic state dict -> flax tree coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.core.convert_d2 import convert_d2_state_dict
from vfloodnet_tpu.models.detection import GeneralizedRCNN, RCNNConfig


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def test_converter_covers_backbone_fpn_rpn_box():
    cfg = RCNNConfig(num_classes=4, with_masks=True, post_nms_topk=20,
                     max_detections=5)
    model = GeneralizedRCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
    flat_p = _flatten(variables["params"])
    flat_s = _flatten(variables["batch_stats"])

    rng = np.random.RandomState(0)
    sd = {}

    def conv(tkey, fpath):
        arr = flat_p[fpath + "/kernel"]
        sd[tkey + ".weight"] = rng.randn(arr.shape[3], arr.shape[2],
                                         arr.shape[0], arr.shape[1]
                                         ).astype(np.float32)

    def norm(tkey, fpath_bn):
        for leaf, tleaf in [("scale", "norm.weight"), ("bias", "norm.bias")]:
            sd[f"{tkey}.{tleaf}"] = rng.randn(
                *flat_p[f"{fpath_bn}/{leaf}"].shape).astype(np.float32)
        for leaf, tleaf in [("mean", "norm.running_mean"),
                            ("var", "norm.running_var")]:
            sd[f"{tkey}.{tleaf}"] = rng.rand(
                *flat_s[f"{fpath_bn}/{leaf}"].shape).astype(np.float32)

    conv("backbone.bottom_up.stem.conv1", "backbone/stem_conv")
    norm("backbone.bottom_up.stem.conv1", "backbone/stem_bn")

    # enumerate backbone blocks from the flax tree itself
    blocks = sorted({p.split("/")[1] for p in flat_p
                     if p.startswith("backbone/res")})
    for blk in blocks:
        stage = blk[3]
        idx = blk.split("block")[1]
        t = f"backbone.bottom_up.res{stage}.{idx}"
        for ci, (cm, bm) in enumerate([("conv1", "bn1"), ("conv2", "bn2"),
                                       ("conv3", "bn3")]):
            conv(f"{t}.conv{ci + 1}", f"backbone/{blk}/{cm}")
            norm(f"{t}.conv{ci + 1}", f"backbone/{blk}/{bm}")
        if f"backbone/{blk}/shortcut/kernel" in flat_p:
            conv(f"{t}.shortcut", f"backbone/{blk}/shortcut")
            norm(f"{t}.shortcut", f"backbone/{blk}/shortcut_bn")

    for lvl in range(2, 6):
        for kind in ("lateral", "output"):
            fpath = f"fpn/{kind}{lvl}"
            conv(f"backbone.fpn_{kind}{lvl}", fpath)
            sd[f"backbone.fpn_{kind}{lvl}.bias"] = rng.randn(
                *flat_p[fpath + "/bias"].shape).astype(np.float32)

    for tmod, fmod in [("conv", "conv"), ("objectness_logits", "objectness"),
                       ("anchor_deltas", "deltas")]:
        conv(f"proposal_generator.rpn_head.{tmod}", f"rpn/head/{fmod}")
        sd[f"proposal_generator.rpn_head.{tmod}.bias"] = rng.randn(
            *flat_p[f"rpn/head/{fmod}/bias"].shape).astype(np.float32)

    for i in (1, 2):
        w = flat_p[f"box_head/fc{i}/kernel"]
        sd[f"roi_heads.box_head.fc{i}.weight"] = rng.randn(
            w.shape[1], w.shape[0]).astype(np.float32)
        sd[f"roi_heads.box_head.fc{i}.bias"] = rng.randn(
            w.shape[1]).astype(np.float32)
    for tmod, fmod in [("cls_score", "cls"), ("bbox_pred", "bbox")]:
        w = flat_p[f"box_head/{fmod}/kernel"]
        sd[f"roi_heads.box_predictor.{tmod}.weight"] = rng.randn(
            w.shape[1], w.shape[0]).astype(np.float32)
        sd[f"roi_heads.box_predictor.{tmod}.bias"] = rng.randn(
            w.shape[1]).astype(np.float32)

    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", f"mask_head/conv{i - 1}")
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = rng.randn(
            *flat_p[f"mask_head/conv{i - 1}/bias"].shape).astype(np.float32)
    dk = flat_p["mask_head/deconv/kernel"]
    sd["roi_heads.mask_head.deconv.weight"] = rng.randn(
        dk.shape[2], dk.shape[3], dk.shape[0], dk.shape[1]).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = rng.randn(
        dk.shape[3]).astype(np.float32)
    conv("roi_heads.mask_head.predictor", "mask_head/predictor")
    sd["roi_heads.mask_head.predictor.bias"] = rng.randn(
        *flat_p["mask_head/predictor/bias"].shape).astype(np.float32)

    converted = convert_d2_state_dict(sd, with_masks=True)
    got_p = _flatten(converted["params"])
    got_s = _flatten(converted["batch_stats"])

    missing = set(flat_p) - set(got_p) - {
        p for p in flat_p if p.startswith("point_head")}
    assert not missing, sorted(missing)[:8]
    for path in got_p:
        assert got_p[path].shape == flat_p[path].shape, path
    assert set(got_s) == set(flat_s)

    # spot check the conv transpose
    np.testing.assert_array_equal(
        got_p["backbone/stem_conv/kernel"],
        np.transpose(sd["backbone.bottom_up.stem.conv1.weight"],
                     (2, 3, 1, 0)))
