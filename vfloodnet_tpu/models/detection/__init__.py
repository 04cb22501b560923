from .backbone import DetectionResNet
from .fpn import FPN
from .rpn import RPN, generate_anchors, decode_boxes
from .heads import BoxHead, MaskHead, KeypointHead
from .meta import GeneralizedRCNN, RCNNConfig, load_default_detector

__all__ = ["DetectionResNet", "FPN", "RPN", "generate_anchors",
           "decode_boxes", "BoxHead", "MaskHead", "KeypointHead",
           "GeneralizedRCNN", "RCNNConfig", "load_default_detector"]
