"""Training-loop integration: one tiny epoch with checkpointing + val."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vfloodnet_tpu.data import WaterImageDataset, WaterVideoTrainDataset
from vfloodnet_tpu.models import AFBURR, LinkNet
from vfloodnet_tpu.train import ImageTrainConfig, VideoTrainConfig
from vfloodnet_tpu.train.loops import run_image_training, run_video_training
from vfloodnet_tpu.utils import save_seg_mask


@pytest.fixture()
def dataset_root(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "ds"
    for name in ("vid0",):
        (root / "JPEGImages" / name).mkdir(parents=True)
        (root / "Annotations" / name).mkdir(parents=True)
        for i in range(2):
            img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "JPEGImages" / name / f"{i}.jpg")
            m = np.zeros((64, 64), np.uint8)
            m[32:, :] = 1
            save_seg_mask(m, str(root / "Annotations" / name / f"{i}.png"))
    (root / "train_imgs.txt").write_text("vid0\n")
    (root / "val_imgs.txt").write_text("vid0\n")
    return str(root)


def test_image_training_loop_with_val(dataset_root, tmp_path):
    cfg = ImageTrainConfig(epochs=1, batch_size=2, input_size=48)
    ds = WaterImageDataset("train_offline", dataset_root, input_size=48)
    val = WaterImageDataset("train_offline", dataset_root, input_size=48,
                            dataset_file="val_imgs.txt")
    model = LinkNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    log_dir = str(tmp_path / "log")
    best = run_image_training(model, variables, cfg, ds, log_dir,
                              val_dataset=val)
    assert os.path.exists(best)
    assert os.path.exists(os.path.join(log_dir, "final"))
    assert os.path.exists(os.path.join(log_dir, "curves.png"))


def test_video_training_loop(dataset_root, tmp_path):
    cfg = VideoTrainConfig(epochs=1, clip_n=2, max_obj_n=2, output_size=48)
    ds = WaterVideoTrainDataset(dataset_root, output_size=48, clip_n=2,
                                max_obj_n=2)
    model = AFBURR(read_chunk=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 48, 3)),
                           jnp.zeros((2, 48, 48)), method=model.init_all)
    log_dir = str(tmp_path / "vlog")
    best = run_video_training(model, variables, cfg, ds, log_dir,
                              batch_size=1)
    assert os.path.exists(best)
    assert os.path.exists(os.path.join(log_dir, "scripts"))
