"""NMS / ROIAlign unit tests vs numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.ops.nms import batched_class_nms, box_iou, nms
from vfloodnet_tpu.ops.roi_align import multilevel_roi_align, roi_align


def test_box_iou():
    a = jnp.asarray([[0., 0., 10., 10.]])
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.],
                     [20., 20., 30., 30.]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25. / 175., 0.0], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0., 0., 10., 10.],
        [1., 1., 11., 11.],   # heavy overlap with 0
        [20., 20., 30., 30.],
        [50., 50., 60., 60.],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.1])
    idx, sc, valid = nms(boxes, scores, iou_threshold=0.5, max_out=4,
                         score_threshold=0.2)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}
    assert int(np.asarray(valid).sum()) == 2


def test_nms_keeps_all_disjoint():
    boxes = jnp.asarray([[i * 20., 0., i * 20. + 10., 10.] for i in range(5)])
    scores = jnp.asarray([0.5, 0.9, 0.3, 0.8, 0.6])
    idx, sc, valid = nms(boxes, scores, 0.5, 5)
    assert int(np.asarray(valid).sum()) == 5
    # sorted by score desc
    assert np.asarray(idx).tolist() == [1, 3, 4, 0, 2]


def test_class_aware_nms():
    boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.]])
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 1])
    idx, sc, valid = batched_class_nms(boxes, scores, classes, 0.5, 2)
    assert int(np.asarray(valid).sum()) == 2  # different class -> both kept


def test_roi_align_constant_region():
    feat = jnp.ones((16, 16, 3)) * 5.0
    boxes = jnp.asarray([[2., 2., 10., 10.]])
    out = roi_align(feat, boxes, pooled=4)
    assert out.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_gradient_field():
    # feature = x coordinate; pooled values should advance linearly
    h = w = 32
    xs = np.broadcast_to(np.arange(w, dtype=np.float32), (h, w))
    feat = jnp.asarray(xs[..., None])
    boxes = jnp.asarray([[8., 8., 24., 24.]])
    out = np.asarray(roi_align(feat, boxes, pooled=4, sampling_ratio=2))[0, ..., 0]
    # rows identical, columns increasing by bin width 4
    np.testing.assert_allclose(out[0], out[3], atol=1e-4)
    diffs = np.diff(out[0])
    np.testing.assert_allclose(diffs, 4.0, atol=1e-3)
    # first bin centre: x1-0.5 + bw/8 ... sample mean = 8-0.5+2 = 9.5
    np.testing.assert_allclose(out[0, 0], 9.5, atol=1e-3)


def test_multilevel_roi_align_level_routing():
    # two levels; big box must come from the stride-8 map, small from stride-4
    f4 = jnp.ones((32, 32, 2)) * 1.0
    f8 = jnp.ones((16, 16, 2)) * 2.0
    boxes = jnp.asarray([
        [0., 0., 56., 56.],      # scale 56 -> level 0 (P2-equivalent)
        [0., 0., 120., 120.],    # scale 120 -> level 1
    ])
    out = np.asarray(multilevel_roi_align([f4, f8], boxes, [4, 8], pooled=2,
                                          canonical_size=224.0,
                                          canonical_level=2))
    np.testing.assert_allclose(out[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 2.0, atol=1e-5)
