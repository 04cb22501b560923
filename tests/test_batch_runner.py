"""run_video_segmentation_batch: output-tree contract over two streams."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.pipelines.video_seg_batch import \
    run_video_segmentation_batch
from vfloodnet_tpu.utils import load_mask, save_seg_mask


def test_batch_runner_two_streams(tmp_path):
    rng = np.random.RandomState(0)
    names = ["vidA", "vidB"]
    lengths = [4, 3]
    out_dir = str(tmp_path / "out")
    for name, n in zip(names, lengths):
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i:03d}.jpg")
        mask_dir = tmp_path / "out" / name / "mask"
        mask_dir.mkdir(parents=True)
        m = np.zeros((48, 64), np.uint8)
        m[24:, :] = 1
        save_seg_mask(m, str(mask_dir / "000.png"))

    model = AFBURR(read_chunk=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)

    res = run_video_segmentation_batch(
        [str(tmp_path / n) for n in names], names, out_dir, model, variables,
        budget=1024, downsample=48, viz=True)

    assert res["frames"] == (4 - 1) + (3 - 1)
    for name, n in zip(names, lengths):
        masks = sorted(os.listdir(os.path.join(out_dir, name, "mask")))
        assert len(masks) == n
        m = load_mask(os.path.join(out_dir, name, "mask", masks[-1]))
        assert m.shape == (48, 64)
