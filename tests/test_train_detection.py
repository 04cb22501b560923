"""Detection trainer: target assignment semantics + a real optimization
smoke on a tiny RCNN (train/train_detection.py).

Reference counterpart: none — the reference only runs released COCO
weights (estimation/object_detection.py:16-25); this trainer exists so the
detection chain can run with real weights in this environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfloodnet_tpu.train.train_detection import (
    DetectionTrainConfig, assign_roi_targets, assign_rpn_targets,
    encode_boxes, init_detection_train_state, level_anchors,
    make_detection_train_step, pairwise_iou)
from vfloodnet_tpu.models.detection.rpn import decode_boxes


def test_pairwise_iou_basics():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0],
                     [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(pairwise_iou(a, b))[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25.0 / 175.0)
    assert iou[2] == pytest.approx(0.0)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(
        np.concatenate([rng.uniform(0, 100, (32, 2)),
                        rng.uniform(110, 200, (32, 2))], axis=1),
        jnp.float32)
    gt = anchors + jnp.asarray(rng.uniform(-5, 5, (32, 4)), jnp.float32)
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        deltas = encode_boxes(gt, anchors, weights=w)
        back = decode_boxes(anchors, deltas, weights=w)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt),
                                   atol=1e-3)


def test_rpn_target_assignment():
    anchors = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],      # exact match -> pos
        [0.5, 0.5, 10.5, 10.5],      # IoU ~0.81 -> pos
        [50.0, 50.0, 60.0, 60.0],    # no overlap -> neg
        [3.0, 3.0, 13.0, 13.0],      # IoU ~0.33 -> ignore
    ])
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 1.0, 1.0]])
    gt_valid = jnp.asarray([1.0, 0.0])
    labels, deltas = assign_rpn_targets(anchors, gt, gt_valid, 0.7, 0.3)
    labels = np.asarray(labels)
    assert labels[0] == 1 and labels[1] == 1
    assert labels[2] == 0
    assert labels[3] == -1
    # positive anchors' targets reconstruct the gt box
    back = decode_boxes(anchors[:1], deltas[:1])
    np.testing.assert_allclose(np.asarray(back)[0], np.asarray(gt[0]),
                               atol=1e-3)


def test_rpn_best_anchor_forced_positive():
    # tiny gt that no anchor reaches 0.7 IoU with: its best anchor must
    # still become positive
    anchors = jnp.asarray([[0.0, 0.0, 32.0, 32.0], [40.0, 0.0, 72.0, 32.0]])
    gt = jnp.asarray([[2.0, 2.0, 8.0, 8.0]])
    labels, _ = assign_rpn_targets(anchors, gt, jnp.asarray([1.0]), 0.7, 0.3)
    assert int(labels[0]) == 1


def test_roi_targets_background_index():
    rois = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [80.0, 80.0, 95.0, 95.0]])
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    cls, fg, arg, _ = assign_roi_targets(
        rois, gt, jnp.asarray([11]), jnp.asarray([1.0]),
        num_classes=80, fg_iou=0.5)
    assert int(cls[0]) == 11 and bool(fg[0])
    assert int(cls[1]) == 80 and not bool(fg[1])   # background = K
    assert int(arg[0]) == 0


def test_level_anchors_count():
    a = level_anchors(64)
    want = sum((-(-64 // s)) ** 2 * 3 for s in (4, 8, 16, 32, 64))
    assert a.shape == (want, 4)


@pytest.mark.slow
def test_detection_train_step_loss_decreases():
    from vfloodnet_tpu.data.detection_dataset import SyntheticStopsignDataset
    from vfloodnet_tpu.models.detection.meta import GeneralizedRCNN
    from vfloodnet_tpu.train.train_detection import tiny_stopsign_config

    size = 96
    tc = DetectionTrainConfig(image_size=size, roi_n=16, roi_topk=6,
                              lr=1e-3)
    mc = tiny_stopsign_config(size)
    model = GeneralizedRCNN(mc)
    init = jax.jit(lambda k, img: model.init(k, img, method=model.init_all))
    variables = init(jax.random.PRNGKey(0), jnp.zeros((size, size, 3)))
    state, tx = init_detection_train_state(model, variables, tc)
    step_fn = make_detection_train_step(model, tx, tc)

    ds = SyntheticStopsignDataset(n=8, size=size, seed=3)
    losses = []
    for i in range(8):
        img, boxes, classes, masks, valid = ds.get(i)
        state, loss, _ = step_fn(state, jnp.asarray(img), jnp.asarray(boxes),
                                 jnp.asarray(classes), jnp.asarray(masks),
                                 jnp.asarray(valid))
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@pytest.mark.slow
def test_keypoint_train_step_loss_decreases():
    """Keypoint heatmap CE (Detectron2 keypoint_rcnn_loss semantics) wired
    into the train step: finite, decreasing on repeated scenes, and the
    head's params receive gradients."""
    from vfloodnet_tpu.data.detection_dataset import SyntheticPeopleDataset
    from vfloodnet_tpu.models.detection.meta import GeneralizedRCNN
    from vfloodnet_tpu.train.train_detection import tiny_people_config

    size = 96
    tc = DetectionTrainConfig(image_size=size, roi_n=16, roi_topk=6,
                              keypoint_rois=4, lr=1e-3)
    mc = tiny_people_config(size)
    assert mc.with_keypoints
    model = GeneralizedRCNN(mc)
    init = jax.jit(lambda k, img: model.init(k, img, method=model.init_all))
    variables = init(jax.random.PRNGKey(0), jnp.zeros((size, size, 3)))
    state, tx = init_detection_train_state(model, variables, tc)
    step_fn = make_detection_train_step(model, tx, tc)

    ds = SyntheticPeopleDataset(n=8, size=size, seed=3)
    kp0 = jax.device_get(state.params["keypoint_head"])
    kp_losses = []
    for i in range(8):
        img, boxes, classes, masks, valid, kps = ds.get(i % 2)
        state, loss, aux = step_fn(state, jnp.asarray(img),
                                   jnp.asarray(boxes), jnp.asarray(classes),
                                   jnp.asarray(masks), jnp.asarray(valid),
                                   jnp.asarray(kps))
        assert np.isfinite(float(loss))
        assert "kp" in aux
        kp_losses.append(float(aux["kp"]))
    assert np.mean(kp_losses[-2:]) < np.mean(kp_losses[:2])
    kp1 = jax.device_get(state.params["keypoint_head"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), kp0, kp1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0
