"""Native PNG IO: build, round-trip, PIL compatibility, speed sanity."""

import time

import numpy as np
import pytest
from PIL import Image

from vfloodnet_tpu import native
from vfloodnet_tpu.utils import COLOR_PALETTE, load_mask, save_seg_mask


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native IO unavailable")
    return True


def test_round_trip_native(lib_ok, tmp_path):
    rng = np.random.RandomState(0)
    labels = (rng.rand(123, 201) * 3).astype(np.uint8)
    path = str(tmp_path / "m.png")
    assert native.write_palette_png(path, labels, COLOR_PALETTE)
    back = native.read_palette_png(path)
    np.testing.assert_array_equal(back, labels)


def test_pil_reads_native_output(lib_ok, tmp_path):
    labels = np.zeros((50, 60), np.uint8)
    labels[20:, :] = 1
    path = str(tmp_path / "m.png")
    assert native.write_palette_png(path, labels, COLOR_PALETTE)
    img = Image.open(path)
    assert img.mode == "P"
    np.testing.assert_array_equal(np.asarray(img), labels)
    assert img.getpalette()[3:6] == [0, 0, 128]


def test_native_reads_pil_output(lib_ok, tmp_path):
    labels = (np.random.RandomState(1).rand(40, 30) * 2).astype(np.uint8)
    path = str(tmp_path / "pil.png")
    img = Image.fromarray(labels, "P")
    img.putpalette(COLOR_PALETTE)
    img.save(path)
    back = native.read_palette_png(path)
    np.testing.assert_array_equal(back, labels)


def test_save_seg_mask_uses_native_and_round_trips(tmp_path):
    labels = (np.random.RandomState(2).rand(64, 64) * 2).astype(np.uint8)
    path = str(tmp_path / "seg.png")
    save_seg_mask(labels, path)
    np.testing.assert_array_equal(load_mask(path), labels)


def test_native_faster_than_pil(lib_ok, tmp_path):
    labels = (np.random.RandomState(3).rand(1080, 1920) * 2).astype(np.uint8)
    path_n = str(tmp_path / "n.png")
    path_p = str(tmp_path / "p.png")

    t0 = time.time()
    for _ in range(3):
        native.write_palette_png(path_n, labels, COLOR_PALETTE)
    t_native = (time.time() - t0) / 3

    img = Image.fromarray(labels, "P")
    img.putpalette(COLOR_PALETTE)
    t0 = time.time()
    for _ in range(3):
        img.save(path_p)
    t_pil = (time.time() - t0) / 3
    assert t_native < t_pil / 2, (t_native, t_pil)
