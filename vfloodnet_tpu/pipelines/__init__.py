from .video_seg import VideoSegEngine, run_video_segmentation
from .image_seg import run_image_segmentation
from .loaders import load_afb_urr

__all__ = ["VideoSegEngine", "run_video_segmentation",
           "run_image_segmentation", "load_afb_urr"]
