from .transforms import (ClipAugmenter, random_resized_crop_pair,
                         random_affine_pair, random_hflip_pair,
                         color_jitter, to_onehot_shuffled)
from .video_dataset import WaterVideoTrainDataset, VideoFrameDataset
from .image_dataset import WaterImageDataset
from .loader import BatchLoader

__all__ = [
    "ClipAugmenter", "random_resized_crop_pair", "random_affine_pair",
    "random_hflip_pair", "color_jitter", "to_onehot_shuffled",
    "WaterVideoTrainDataset", "VideoFrameDataset", "WaterImageDataset",
    "BatchLoader",
]
