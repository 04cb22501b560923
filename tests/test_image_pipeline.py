"""Batched image segmentation pipeline smoke test (CPU, random weights)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vfloodnet_tpu.models import LinkNet
from vfloodnet_tpu.pipelines.image_seg import run_image_segmentation
from vfloodnet_tpu.utils import load_mask


def test_run_image_segmentation_batched(tmp_path):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    sizes = [(60, 80), (72, 64), (50, 50)]   # heterogeneous resolutions
    for i, (h, w) in enumerate(sizes):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            img_dir / f"im{i}.jpg")

    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 3)))

    out_dir = str(tmp_path / "out")
    results = run_image_segmentation(str(img_dir), "t", out_dir,
                                     model=model, variables=variables,
                                     batch_size=2)
    assert len(results) == 3
    for i, (mask_path, overlay_path) in enumerate(sorted(results)):
        assert os.path.exists(mask_path) and os.path.exists(overlay_path)
    m0 = load_mask(os.path.join(out_dir, "t", "mask", "im0.png"))
    assert m0.shape == sizes[0]
    assert set(np.unique(m0)) <= {0, 1}
