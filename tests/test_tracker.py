"""First-party MOSSE correlation tracker (ops/tracker.py) — the CSRT
replacement for cv2 builds without contrib trackers (reference capability:
estimation/reference_tracking.py:105-113)."""

import numpy as np

from vfloodnet_tpu.ops.tracker import MosseTracker


def _scene(rng, cx, cy, size=240, side=30):
    """Noise background with a bright textured square at (cx, cy)."""
    img = rng.uniform(0, 60, (size, size)).astype(np.float32)
    tex = (np.indices((side, side)).sum(0) % 7) * 25.0 + 120.0
    x1, y1 = int(cx - side / 2), int(cy - side / 2)
    img[y1:y1 + side, x1:x1 + side] = tex
    return img


def test_mosse_follows_translating_object():
    rng = np.random.default_rng(0)
    cx, cy = 80.0, 90.0
    tr = MosseTracker()
    tr.init(_scene(rng, cx, cy), (int(cx - 15), int(cy - 15), 30, 30))

    errs = []
    for t in range(15):
        cx += 3.0
        cy += 2.0
        ok, (x, y, w, h) = tr.update(_scene(rng, cx, cy))
        assert ok, f"tracker reported failure at step {t}"
        errs.append(np.hypot(x + w / 2 - cx, y + h / 2 - cy))
    assert np.mean(errs[-5:]) < 4.0, errs


def test_mosse_flags_object_loss():
    rng = np.random.default_rng(1)
    tr = MosseTracker()
    tr.init(_scene(rng, 120, 120), (105, 105, 30, 30))
    ok, _ = tr.update(_scene(rng, 120, 120))
    assert ok
    # object gone: pure noise frames should eventually drop PSR below the
    # gate (the filter stops updating, so it cannot relearn the noise)
    flags = [tr.update(rng.uniform(0, 60, (240, 240)).astype(np.float32))[0]
             for _ in range(5)]
    assert not all(flags), "tracker never flagged the object loss"


def test_mosse_bbox_stays_in_bounds():
    rng = np.random.default_rng(2)
    size = 200
    tr = MosseTracker()
    tr.init(_scene(rng, 30, 30, size=size), (15, 15, 30, 30))
    for t in range(10):
        _, (x, y, w, h) = tr.update(_scene(rng, 25 - t, 25 - t, size=size))
    assert -w <= x < size and -h <= y < size


def _scene_scaled(rng, cx, cy, side, size=240):
    img = rng.uniform(0, 60, (size, size)).astype(np.float32)
    s = int(round(side))
    tex = (np.indices((s, s)).sum(0) % 7) * 25.0 + 120.0
    x1, y1 = int(cx - s / 2), int(cy - s / 2)
    img[y1:y1 + s, x1:x1 + s] = tex
    return img


def test_mosse_adapts_to_scale_change():
    """DSST-style scale search: an object growing ~2.3%/frame must carry
    the bbox size with it (reference CSRT handles scale drift,
    reference_tracking.py:105-113; translation-only MOSSE cannot)."""
    rng = np.random.default_rng(3)
    cx = cy = 120.0
    side = 30.0
    tr = MosseTracker()
    tr.init(_scene_scaled(rng, cx, cy, side), (105, 105, 30, 30))
    for t in range(24):
        side *= 1.023
        ok, (x, y, w, h) = tr.update(_scene_scaled(rng, cx, cy, side))
        assert ok, f"lost at step {t} (side {side:.1f})"
    # ~74% total growth; damped adaptation must recover a good part of it
    assert w >= 38, (w, side)
    assert abs(x + w / 2 - cx) < 6 and abs(y + h / 2 - cy) < 6


def test_mosse_scale_stays_put_on_static_object():
    """Scale search must not wander on a static anchor."""
    rng = np.random.default_rng(4)
    tr = MosseTracker()
    tr.init(_scene_scaled(rng, 120, 120, 30), (105, 105, 30, 30))
    for _ in range(20):
        ok, (x, y, w, h) = tr.update(_scene_scaled(rng, 120, 120, 30))
        assert ok
    assert 26 <= w <= 35, w
    assert abs(x + w / 2 - 120) < 4
