"""Video training / eval datasets.

Capability parity with the reference Water_DS.py:

- :class:`WaterVideoTrainDataset` == ``Water_Image_Train_DS`` (:14-83): reads
  ``<root>/train_imgs.txt`` listing subdirs of ``JPEGImages``/``Annotations``,
  synthesises a clip_n-frame pseudo-video per annotated image via paired
  augmentation.
- :class:`VideoFrameDataset` == ``Video_DS`` (:87-111): streaming eval
  dataset holding the first frame+mask and yielding the rest.

Determinism: sample i of epoch e is a pure function of (seed, e, i).
"""

from __future__ import annotations

import os
from glob import glob
from typing import List, Tuple

import numpy as np

from ..utils import load_image, load_mask
from .transforms import ClipAugmenter


def _read_pairs(root: str, dataset_file: str) -> Tuple[List[str], List[str]]:
    imgs, masks = [], []
    with open(os.path.join(root, dataset_file)) as f:
        for line in f:
            name = line.strip()
            if not name:
                continue
            img_dir = os.path.join(root, "JPEGImages", name)
            mask_dir = os.path.join(root, "Annotations", name)
            img_list = sorted(glob(os.path.join(img_dir, "*.jpg"))
                              + glob(os.path.join(img_dir, "*.png")))
            mask_list = sorted(glob(os.path.join(mask_dir, "*.png")))
            if len(img_list) != len(mask_list):
                raise ValueError(f"image/mask count mismatch in {name}")
            imgs += img_list
            masks += mask_list
    return imgs, masks


class WaterVideoTrainDataset:
    def __init__(self, root: str, output_size: int = 400,
                 dataset_file: str = "train_imgs.txt", clip_n: int = 6,
                 max_obj_n: int = 3, seed: int = 0):
        self.img_list, self.mask_list = _read_pairs(root, dataset_file)
        self.augment = ClipAugmenter(output_size, clip_n, max_obj_n)
        self.seed = seed

    def __len__(self) -> int:
        return len(self.img_list)

    def get(self, idx: int, epoch: int = 0):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        img = load_image(self.img_list[idx], "RGB")
        mask = load_image(self.mask_list[idx], "P")
        frames, masks, obj_n = self.augment(rng, img, mask)
        return frames, masks, obj_n

    # torch-style alias
    __getitem__ = get


class VideoFrameDataset:
    """Streaming frames of one video; first frame+mask held separately."""

    def __init__(self, img_list: List[str], first_frame: np.ndarray,
                 first_mask: np.ndarray):
        self.img_list = img_list[1:]
        self.first_frame = first_frame          # [H, W, 3] float01
        first_mask = np.asarray(first_mask, np.uint8)
        self.obj_n = int(first_mask.max()) + 1
        self.first_mask = first_mask            # [H, W] labels

    def __len__(self) -> int:
        return len(self.img_list)

    def __getitem__(self, idx: int):
        img = np.asarray(load_image(self.img_list[idx]), np.float32) / 255.0
        name = os.path.splitext(os.path.basename(self.img_list[idx]))[0]
        return img, name
