from .train_video import (VideoTrainConfig, make_video_train_step,
                          init_video_train_state, video_clip_loss)
from .train_image import (ImageTrainConfig, make_image_train_step,
                          init_image_train_state, dice_loss, iou_metric)
from .train_detection import (DetectionTrainConfig,
                              make_detection_train_step,
                              init_detection_train_state,
                              tiny_stopsign_config)

__all__ = [
    "VideoTrainConfig", "make_video_train_step", "init_video_train_state",
    "video_clip_loss",
    "ImageTrainConfig", "make_image_train_step", "init_image_train_state",
    "dice_loss", "iou_metric",
    "DetectionTrainConfig", "make_detection_train_step",
    "init_detection_train_state", "tiny_stopsign_config",
]
