import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfloodnet_tpu import ops


def test_pad_divide_by():
    x = jnp.ones((1, 30, 54, 3))
    padded, pad = ops.pad_divide_by(x, 16)
    assert padded.shape == (1, 32, 64, 3)
    top, bottom, left, right = pad
    assert (top, bottom) == (1, 1)
    assert (left, right) == (5, 5)
    back = ops.unpad(padded, pad)
    assert back.shape == x.shape
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pad_noop_when_divisible():
    x = jnp.ones((2, 32, 64, 3))
    padded, pad = ops.pad_divide_by(x, 16)
    assert padded.shape == x.shape
    assert pad == (0, 0, 0, 0)


def test_short_side_size():
    assert ops.short_side_size(720, 1280, 480) == (480, 853)
    assert ops.short_side_size(1280, 720, 480) == (853, 480)


def test_resize_shapes_and_range():
    x = jnp.array(np.random.RandomState(0).rand(1, 33, 57, 3), jnp.float32)
    y = ops.resize(x, (66, 114), "bilinear")
    assert y.shape == (1, 66, 114, 3)
    yb = ops.resize(x, (16, 28), "bicubic")
    assert yb.shape == (1, 16, 28, 3)
    yn = ops.resize((x[..., 0] > 0.5).astype(jnp.uint8), (66, 114), "nearest",
                    spatial_axes=(-2, -1))
    assert yn.dtype == jnp.uint8
    assert set(np.unique(np.asarray(yn))) <= {0, 1}


def test_calc_uncertainty():
    # Two-object probs: confident pixel -> low uncertainty, 50/50 -> 1.
    score = jnp.array([[[[0.99, 0.01], [0.5, 0.5]]]])  # [1,1,2,2objs]
    unc = ops.calc_uncertainty(score)
    assert unc.shape == (1, 1, 2, 1)
    u = np.asarray(unc)[0, 0]
    assert u[0, 0] < 1e-10 + np.exp(1 - 99.0)
    np.testing.assert_allclose(u[1, 0], 1.0, rtol=1e-5)


def test_largest_connected_component():
    mask = np.zeros((20, 30), np.uint8)
    mask[2:6, 2:6] = 1        # 16 px blob
    mask[10:18, 10:25] = 1    # 120 px blob (largest)
    mask[0, 29] = 1           # single pixel
    out = np.asarray(ops.largest_connected_component(jnp.asarray(mask)))
    expected = np.zeros_like(mask)
    expected[10:18, 10:25] = 1
    np.testing.assert_array_equal(out, expected)


def test_connected_components_diagonal_is_8_connected():
    mask = np.zeros((8, 8), np.uint8)
    mask[0, 0] = 1
    mask[1, 1] = 1  # touches diagonally -> same component
    labels = np.asarray(ops.connected_components(jnp.asarray(mask)))
    assert labels[0, 0] == labels[1, 1]
    assert labels[5, 5] == -1


def test_largest_cc_snake():
    # Snake-shaped region exercises multi-iteration propagation.
    mask = np.zeros((16, 16), np.uint8)
    mask[0, :] = 1
    mask[:, 15] = 1
    mask[15, :] = 1
    mask[2:14, 0] = 1  # separate line, smaller
    out = np.asarray(ops.largest_connected_component(jnp.asarray(mask)))
    assert out[0, 0] == 1 and out[15, 0] == 1 and out[8, 15] == 1
    assert out[8, 0] == 0


def test_waterline_scan():
    mask = np.zeros((10, 5), np.uint8)
    mask[7:, 2] = 1
    mask[3:, 4] = 1
    first = np.asarray(ops.waterline_scan(jnp.asarray(mask)))
    assert first[2] == 7
    assert first[4] == 3
    assert first[0] == 10  # no water

    from vfloodnet_tpu.ops.waterline import waterline_below
    y = waterline_below(jnp.asarray(mask), jnp.int32(2), jnp.int32(5))
    assert int(y) == 7


def test_local_pools_match_reference_semantics():
    x = jnp.array(np.random.RandomState(1).rand(1, 9, 9, 2), jnp.float32)
    avg = ops.local_avg_pool(x, 3)
    mx = ops.local_max_pool(x, 3)
    xn = np.asarray(x)[0]
    # Center pixel check vs naive window.
    win = xn[3:6, 3:6, 0]
    np.testing.assert_allclose(np.asarray(avg)[0, 4, 4, 0], win.mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mx)[0, 4, 4, 0], win.max(), rtol=1e-5)
    # Corner avg divides by full window area (count_include_pad).
    corner = xn[:2, :2, 0].sum() / 9.0
    np.testing.assert_allclose(np.asarray(avg)[0, 0, 0, 0], corner, rtol=1e-5)


def test_resize_close_to_pil_bilinear():
    # the image pipeline's 416 input resize must track PIL semantics
    from PIL import Image
    rng = np.random.RandomState(7)
    img = (rng.rand(97, 135, 3) * 255).astype(np.uint8)
    pil = np.asarray(Image.fromarray(img).resize((64, 48), Image.BILINEAR),
                     np.float32) / 255.0
    dev = np.asarray(ops.resize(jnp.asarray(img, jnp.float32) / 255.0,
                                (48, 64), "bilinear", spatial_axes=(0, 1),
                                antialias=True))
    assert np.abs(dev - pil).mean() < 0.01
    assert np.abs(dev - pil).max() < 0.12


def test_bicubic_matches_torch_kernel():
    """ops.resize 'bicubic' (antialias=False) must be the EXACT torch
    bicubic (Keys a=-0.75, half-pixel, replicated edges) the reference's
    tensor resizes use (test_video_seg.py:88,107,114)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    for (ih, iw), (oh, ow) in [((37, 53), (24, 80)), ((96, 170), (64, 113)),
                               ((64, 113), (96, 170))]:
        x = rng.rand(ih, iw, 3).astype(np.float32)
        t = torch.from_numpy(x.transpose(2, 0, 1))[None]
        ref = F.interpolate(t, size=(oh, ow), mode="bicubic",
                            align_corners=False).numpy()[0].transpose(1, 2, 0)
        mine = np.asarray(ops.resize(x, (oh, ow), "bicubic",
                                     spatial_axes=(0, 1)))
        np.testing.assert_allclose(mine, ref, atol=1e-4, rtol=1e-4)


def test_nearest_torch_matches_torch():
    """'nearest_torch' must reproduce torch floor-indexing nearest
    (test_video_seg.py:89 first-mask downsize) bit-exactly."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(4)
    for (ih, iw), (oh, ow) in [((31, 47), (17, 80)), ((96, 170), (64, 113))]:
        x = (rng.rand(2, ih, iw) > 0.5).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x)[None], size=(oh, ow),
                            mode="nearest").numpy()[0]
        mine = np.asarray(ops.resize(jnp.asarray(x), (oh, ow),
                                     "nearest_torch", spatial_axes=(-2, -1)))
        assert np.array_equal(mine, ref)
