"""Detection model graph tests (small shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfloodnet_tpu.models.detection import (FPN, RPN, DetectionResNet,
                                            GeneralizedRCNN, RCNNConfig)
from vfloodnet_tpu.models.detection.rpn import decode_boxes, generate_anchors


def test_backbone_strides_and_channels():
    m = DetectionResNet(blocks=(1, 1, 1, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    c2, c3, c4, c5 = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert c2.shape == (1, 16, 16, 256)
    assert c3.shape == (1, 8, 8, 512)
    assert c4.shape == (1, 4, 4, 1024)
    assert c5.shape == (1, 2, 2, 2048)


def test_grouped_backbone():
    m = DetectionResNet(blocks=(1, 1, 1, 1), groups=32, width_per_group=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    c2, *_ = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert c2.shape == (1, 16, 16, 256)


def test_fpn_shapes():
    feats = tuple(jnp.zeros((1, 2 ** (4 - i), 2 ** (4 - i), 256 * 2 ** i))
                  for i in range(4))
    m = FPN()
    v = m.init(jax.random.PRNGKey(0), feats)
    outs = m.apply(v, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 256)
    assert outs[3].shape == (1, 2, 2, 256)
    assert outs[4].shape == (1, 1, 1, 256)


def test_generate_anchors():
    a = np.asarray(generate_anchors(2, 3, 4, 32))
    assert a.shape == (2 * 3 * 3, 4)
    # ratio-1 anchor at cell (0,0): centred on (2, 2), 32x32
    square = a[1]
    np.testing.assert_allclose(square, [2 - 16, 2 - 16, 2 + 16, 2 + 16])


def test_decode_boxes_identity_and_shift():
    anchors = jnp.asarray([[0., 0., 10., 10.]])
    deltas = jnp.zeros((1, 4))
    np.testing.assert_allclose(np.asarray(decode_boxes(anchors, deltas)),
                               [[0, 0, 10, 10]], atol=1e-5)
    deltas = jnp.asarray([[0.1, 0.0, 0.0, 0.0]])
    out = np.asarray(decode_boxes(anchors, deltas))[0]
    np.testing.assert_allclose(out, [1, 0, 11, 10], atol=1e-5)


def test_generalized_rcnn_forward():
    cfg = RCNNConfig(num_classes=3, with_masks=True, post_nms_topk=50,
                     max_detections=10)
    model = GeneralizedRCNN(cfg)
    img = jnp.zeros((64, 96, 3))
    v = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(v, img)
    assert out["boxes"].shape == (10, 4)
    assert out["scores"].shape == (10,)
    assert out["classes"].shape == (10,)
    assert out["valid"].shape == (10,)
    assert out["mask_logits"].shape == (10, 28, 28)
    assert bool(jnp.isfinite(out["boxes"]).all())


def test_detector_wrapper_with_pointrend():
    import numpy as np
    from vfloodnet_tpu.models.detection.meta import build_detector
    cfg = RCNNConfig(num_classes=3, with_masks=True, with_pointrend=True,
                     post_nms_topk=20, max_detections=4,
                     test_short_side=64, test_max_side=96)
    model = GeneralizedRCNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)),
                   method=model.init_all)
    # init_all must create the point head (refinement runs outside __call__)
    assert "point_head" in v["params"]
    det = build_detector(cfg, v)
    img = (np.random.RandomState(0).rand(80, 100, 3) * 255).astype(np.uint8)
    inst = det(img)
    assert inst.boxes.shape[1] == 4
    if len(inst) > 0:
        assert inst.masks.shape[1:] == (80, 100)


def test_keypoint_rcnn_forward():
    cfg = RCNNConfig(num_classes=1, with_keypoints=True, post_nms_topk=30,
                     max_detections=5)
    model = GeneralizedRCNN(cfg)
    img = jnp.zeros((64, 64, 3))
    v = model.init(jax.random.PRNGKey(1), img)
    out = model.apply(v, img)
    assert out["keypoint_heatmaps"].shape == (5, 56, 56, 17)
