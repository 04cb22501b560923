from .pad import pad_divide_by, unpad
from .resize import resize, resize_short_side, short_side_size
from .uncertainty import calc_uncertainty
from .cc import largest_connected_component, connected_components
from .waterline import waterline_scan
from .pooling import local_avg_pool, local_max_pool
from .attention import bank_attention_read
from .bank_update import bank_merge_append
from .homography import (find_homography, perspective_transform,
                         warp_perspective_nearest)
from .nms import box_iou, nms, batched_class_nms
from .roi_align import roi_align, multilevel_roi_align

__all__ = [
    "find_homography", "perspective_transform", "warp_perspective_nearest",
    "box_iou", "nms", "batched_class_nms",
    "roi_align", "multilevel_roi_align",
    "pad_divide_by",
    "unpad",
    "resize",
    "resize_short_side",
    "short_side_size",
    "calc_uncertainty",
    "largest_connected_component",
    "connected_components",
    "waterline_scan",
    "local_avg_pool",
    "local_max_pool",
    "bank_attention_read",
    "bank_merge_append",
]
