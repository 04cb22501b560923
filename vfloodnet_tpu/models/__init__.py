from .resnet import ResNet50Backbone
from .afb_urr import AFBURR, EncoderM, EncoderQ, KeyValue, Decoder
from .efficientnet import EfficientNetFeatures
from .linknet import LinkNet, load_linknet

__all__ = ["ResNet50Backbone", "AFBURR", "EncoderM", "EncoderQ", "KeyValue",
           "Decoder", "EfficientNetFeatures", "LinkNet", "load_linknet"]
