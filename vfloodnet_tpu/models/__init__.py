from .resnet import ResNet50Backbone
from .afb_urr import AFBURR, EncoderM, EncoderQ, KeyValue, Decoder
from .efficientnet import EfficientNetFeatures
from .linknet import LinkNet, load_linknet
from .linknet_smp import LinkNetSMP

__all__ = ["ResNet50Backbone", "AFBURR", "EncoderM", "EncoderQ", "KeyValue",
           "Decoder", "EfficientNetFeatures", "LinkNet", "LinkNetSMP",
           "load_linknet"]
