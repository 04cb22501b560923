"""Dataset / augmentation / loader tests."""

import os

import numpy as np
import pytest
from PIL import Image

from vfloodnet_tpu.data import (BatchLoader, ClipAugmenter,
                                WaterImageDataset, WaterVideoTrainDataset,
                                to_onehot_shuffled)
from vfloodnet_tpu.data.transforms import (color_jitter, random_affine_pair,
                                           random_hflip_pair,
                                           random_resized_crop_pair)
from vfloodnet_tpu.utils import save_seg_mask


def _make_dataset_root(tmp_path, n_videos=2, frames_per=3, h=80, w=100):
    rng = np.random.RandomState(0)
    root = tmp_path / "ds"
    names = []
    for v in range(n_videos):
        name = f"vid{v}"
        names.append(name)
        (root / "JPEGImages" / name).mkdir(parents=True)
        (root / "Annotations" / name).mkdir(parents=True)
        for i in range(frames_per):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "JPEGImages" / name / f"{i}.jpg")
            mask = np.zeros((h, w), np.uint8)
            mask[h // 2:, :] = 1
            save_seg_mask(mask, str(root / "Annotations" / name / f"{i}.png"))
    (root / "train_imgs.txt").write_text("\n".join(names) + "\n")
    return str(root)


def test_paired_transforms_keep_alignment():
    rng = np.random.default_rng(0)
    img = Image.fromarray((np.random.RandomState(0).rand(60, 80, 3) * 255)
                          .astype(np.uint8))
    mask_np = np.zeros((60, 80), np.uint8)
    mask_np[30:, :] = 1
    mask = Image.fromarray(mask_np, mode="P")

    i2, m2 = random_hflip_pair(rng, img, mask, p=1.0)
    np.testing.assert_array_equal(np.array(m2), mask_np[:, ::-1])

    i3, m3 = random_affine_pair(rng, img, mask)
    assert i3.size == img.size and m3.size == mask.size
    assert set(np.unique(np.array(m3))) <= {0, 1}

    i4, m4 = random_resized_crop_pair(rng, img, mask, 48)
    assert i4.size == (48, 48) and m4.size == (48, 48)

    j = color_jitter(rng, img)
    assert j.size == img.size


def test_to_onehot_shuffled_background():
    mask = np.zeros((6, 6), np.uint8)
    mask[0:2, :] = 1
    mask[4:, :] = 2
    oh, obj_list = to_onehot_shuffled(np.random.default_rng(0), mask, 4)
    assert oh.shape == (4, 6, 6)
    assert sorted(obj_list) == [1, 2]
    np.testing.assert_allclose(oh.sum(axis=0), np.ones((6, 6)))


def test_clip_augmenter_deterministic():
    img = Image.fromarray((np.random.RandomState(1).rand(70, 90, 3) * 255)
                          .astype(np.uint8))
    mask_np = np.zeros((70, 90), np.uint8)
    mask_np[35:, :] = 1
    mask = Image.fromarray(mask_np, mode="P")
    aug = ClipAugmenter(output_size=48, clip_n=3, max_obj_n=2)
    f1, m1, o1 = aug(np.random.default_rng(42), img, mask)
    f2, m2, o2 = aug(np.random.default_rng(42), img, mask)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(m1, m2)
    assert f1.shape == (3, 48, 48, 3)
    assert m1.shape == (3, 2, 48, 48)


def test_video_train_dataset(tmp_path):
    root = _make_dataset_root(tmp_path)
    ds = WaterVideoTrainDataset(root, output_size=48, clip_n=3, max_obj_n=2)
    assert len(ds) == 6
    frames, masks, obj_n = ds.get(0, epoch=0)
    assert frames.shape == (3, 48, 48, 3)
    assert masks.shape == (3, 2, 48, 48)
    assert obj_n == 2
    # determinism across calls
    f2, m2, _ = ds.get(0, epoch=0)
    np.testing.assert_array_equal(frames, f2)
    # different epoch -> different augmentation
    f3, _, _ = ds.get(0, epoch=1)
    assert not np.array_equal(frames, f3)


def test_image_dataset_and_loader(tmp_path):
    root = _make_dataset_root(tmp_path)
    ds = WaterImageDataset("train_offline", root, input_size=48)
    img, mask = ds.get(0)
    assert img.shape == (48, 48, 3) and mask.shape == (48, 48)
    assert set(np.unique(mask)) <= {0.0, 1.0}

    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    images, masks = batches[0]
    assert images.shape == (2, 48, 48, 3)
    assert masks.shape == (2, 48, 48)
    # deterministic epoch order
    batches2 = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[1][0], batches2[1][0])
