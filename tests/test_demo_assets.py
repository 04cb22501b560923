"""End-to-end on the reference demo assets (real JPEGs, random weights)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ASSETS = "/root/reference/assets"


@pytest.mark.skipif(not os.path.isdir(ASSETS), reason="demo assets absent")
def test_image_pipeline_on_flood_still(tmp_path):
    from vfloodnet_tpu.models import LinkNet
    from vfloodnet_tpu.pipelines.image_seg import run_image_segmentation
    from vfloodnet_tpu.utils import load_mask

    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 3)))
    out_dir = str(tmp_path / "out")
    results = run_image_segmentation(
        os.path.join(ASSETS, "img_exp", "flood0.jpg"), "demo", out_dir,
        model=model, variables=variables)
    mask_path, overlay_path = results[0]
    mask = load_mask(mask_path)
    # full original resolution, binary, palette contract
    assert mask.shape == (1390, 1040)
    assert set(np.unique(mask)) <= {0, 1}
    assert os.path.getsize(overlay_path) > 0
