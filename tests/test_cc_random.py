"""Randomized connected-components correctness vs scipy.ndimage."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from vfloodnet_tpu.ops.cc import connected_components, largest_connected_component
from vfloodnet_tpu.pipelines.video_seg import device_largest_cc, host_largest_cc

_STRUCT8 = np.ones((3, 3), int)


@pytest.mark.parametrize("density,seed", [(0.3, 0), (0.5, 1), (0.6, 2),
                                          (0.7, 3)])
def test_cc_matches_scipy_random(density, seed):
    rng = np.random.RandomState(seed)
    mask = (rng.rand(64, 96) < density).astype(np.uint8)
    ours = np.asarray(connected_components(jnp.asarray(mask)))
    ref, n_ref = ndimage.label(mask, structure=_STRUCT8)
    # same partition: bijection between our labels and scipy's
    ours_ids = ours[mask == 1]
    ref_ids = ref[mask == 1]
    pairs = set(zip(ours_ids.tolist(), ref_ids.tolist()))
    assert len(pairs) == n_ref == len(set(np.unique(ours_ids)))


def test_largest_cc_matches_scipy_random():
    rng = np.random.RandomState(7)
    mask = (rng.rand(80, 120) < 0.55).astype(np.uint8)
    ours = np.asarray(largest_connected_component(jnp.asarray(mask)))
    ref, n = ndimage.label(mask, structure=_STRUCT8)
    sizes = ndimage.sum(mask, ref, index=range(1, n + 1))
    best = int(np.argmax(sizes)) + 1
    np.testing.assert_array_equal(ours, (ref == best).astype(np.uint8))


def test_cc_converges_fast_on_percolation():
    # the pointer-jumping variant must converge well inside max_iters
    rng = np.random.RandomState(11)
    mask = (rng.rand(128, 128) < 0.6).astype(np.uint8)
    out = np.asarray(connected_components(jnp.asarray(mask), max_iters=16))
    ref, n = ndimage.label(mask, structure=_STRUCT8)
    pairs = set(zip(out[mask == 1].tolist(), ref[mask == 1].tolist()))
    assert len(pairs) == n


@pytest.mark.parametrize("scale", [1, 2, 4])
def test_device_largest_cc_scales(scale):
    """The cc_scale knob (VideoSegEngine cc_scale / --cc-scale) must keep the
    dominant component and drop well-separated speckle at every scale."""
    h, w = 96, 128
    small = np.zeros((h, w), np.uint8)
    small[h // 2:, :] = 1                   # dominant bottom half
    small[8:12, 8:12] = 1                   # far-away speckle
    full = np.kron(small, np.ones((4, 4), np.uint8))
    out = np.asarray(device_largest_cc(jnp.asarray(full), jnp.asarray(small),
                                       scale=scale))
    expect = host_largest_cc(full)
    np.testing.assert_array_equal(out, expect)


def test_cc_large_mask_overflow_fallback():
    """Masks over the int32 offset-encoding bound ((max(h,w)+2)*(h*w+1) >=
    2^31, ~1M px) must take the exact pair-scan path — the offset encoding
    would silently wrap and corrupt labels (confirmed at 1200x1920)."""
    h, w = 1100, 1920                      # (1922)*(2112001) >> 2^31
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - h * 0.55) ** 2 / (h * 0.4) ** 2
             + (xx - w * 0.5) ** 2 / (w * 0.45) ** 2) < 1.0).astype(np.uint8)
    mask |= (rng.rand(h, w) > 0.999)       # sprinkle small components
    ours = np.asarray(connected_components(jnp.asarray(mask)))
    ref, n_ref = ndimage.label(mask, structure=_STRUCT8)
    ours_ids = ours[mask == 1]
    ref_ids = ref[mask == 1]
    pairs = set(zip(ours_ids.tolist(), ref_ids.tolist()))
    assert len(pairs) == n_ref == len(set(np.unique(ours_ids)))


def test_device_largest_cc_scale8_demo_masks():
    """The production default (scale 8 + 1-cell dilation) must stay within
    the documented tolerance of the reference-behaviour full-res CC on the
    bundled demo masks, including adversarial false-blob and salt variants
    (committed measurement: scripts/bench_cc_accuracy.py, min IoU 0.999868
    over 24 cases)."""
    import os

    from vfloodnet_tpu.ops import resize
    from vfloodnet_tpu.utils import load_mask

    mask_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "records", "demo_eval", "lake", "masks")
    rng = np.random.RandomState(0)
    for nm in ("0.png", "5.png"):
        m = (load_mask(os.path.join(mask_dir, nm)) > 0).astype(np.uint8)
        h, w = m.shape
        s = 480 / min(h, w)
        small = np.asarray(resize(jnp.asarray(m), (round(h * s), round(w * s)),
                                  "nearest", spatial_axes=(-2, -1)))
        blob = small.copy()
        blob[40:90, small.shape[1] - 120:small.shape[1] - 40] = 1
        salt = small.copy()
        salt[rng.rand(*salt.shape) < 0.002] = 1
        for case in (small, blob, salt):
            ref = host_largest_cc(case)
            got = np.asarray(device_largest_cc(jnp.asarray(case),
                                               jnp.asarray(case), scale=8))
            union = float(np.logical_or(got, ref).sum())
            iou = float(np.logical_and(got, ref).sum()) / max(union, 1.0)
            assert iou >= 0.999, f"{nm}: scale-8 CC IoU {iou} vs full-res"


def test_onehot_gather_path_matches_native(monkeypatch):
    """The TPU one-hot jump-gather decomposition (ops/cc.py gather_flat)
    must be label-exact: same CC output as the native-gather path on
    speckle masks whose grid size falls in the one-hot window."""
    import numpy as np

    from vfloodnet_tpu import ops

    rng = np.random.RandomState(7)
    for density in (0.35, 0.5, 0.65):
        mask = (rng.rand(60, 107) < density).astype(np.uint8)
        monkeypatch.setenv("VFLOOD_CC_GATHER", "native")
        ref = np.asarray(ops.largest_connected_component(mask))
        monkeypatch.setenv("VFLOOD_CC_GATHER", "onehot")
        one = np.asarray(ops.largest_connected_component(mask))
        assert np.array_equal(ref, one)
