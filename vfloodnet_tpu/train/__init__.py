from .train_video import (VideoTrainConfig, make_video_train_step,
                          init_video_train_state, video_clip_loss)
from .train_image import (ImageTrainConfig, make_image_train_step,
                          init_image_train_state, dice_loss, iou_metric)

__all__ = [
    "VideoTrainConfig", "make_video_train_step", "init_video_train_state",
    "video_clip_loss",
    "ImageTrainConfig", "make_image_train_step", "init_image_train_state",
    "dice_loss", "iou_metric",
]
