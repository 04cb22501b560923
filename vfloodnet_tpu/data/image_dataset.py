"""Still-image water dataset.

Capability parity with the reference ``WaterDataset``
(image_module/dataset_water.py:18-160): train_offline mode lists
JPEGImages/Annotations pairs from ``train_imgs.txt``; eval mode lists a plain
image folder. Augmentation: colour adjust, affine, resized crop (+ optional
mask perturbation), mirroring image_module/transforms.py.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from ..utils import load_image
from .transforms import (color_jitter, random_affine_pair,
                         random_mask_perturbation, random_resized_crop_pair)
from .video_dataset import _read_pairs


class WaterImageDataset:
    def __init__(self, mode: str, root: str, input_size: int = 416,
                 dataset_file: str = "train_imgs.txt", seed: int = 0,
                 perturb_masks: bool = False):
        if mode not in ("train_offline", "eval"):
            raise ValueError(mode)
        self.mode = mode
        self.input_size = input_size
        self.seed = seed
        self.perturb_masks = perturb_masks
        if mode == "train_offline":
            self.img_list, self.mask_list = _read_pairs(root, dataset_file)
        else:
            self.img_list = sorted(glob(os.path.join(root, "*.jpg"))
                                   + glob(os.path.join(root, "*.png")))
            self.mask_list = []

    def __len__(self) -> int:
        return len(self.img_list)

    def get(self, idx: int, epoch: int = 0
            ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        img = load_image(self.img_list[idx], "RGB")
        if self.mode == "eval":
            size = (self.input_size, self.input_size)
            arr = np.asarray(img.resize(size, Image.BILINEAR),
                             np.float32) / 255.0
            return arr, None

        mask = load_image(self.mask_list[idx], "P")
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        img = color_jitter(rng, img, brightness=0.55, contrast=0.8,
                           saturation=0.0, hue=0.05)
        img, mask = random_affine_pair(rng, img, mask)
        img, mask = random_resized_crop_pair(rng, img, mask, self.input_size)
        mask_np = (np.array(mask, np.uint8) > 0).astype(np.float32)
        if self.perturb_masks:
            mask_np = random_mask_perturbation(rng, mask_np)
        return np.asarray(img, np.float32) / 255.0, mask_np

    __getitem__ = get
