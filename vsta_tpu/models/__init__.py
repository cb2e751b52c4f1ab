from .bevnet import BEVNet, positional_encoding
from .heads import BEVDetectorHead
from .fusion import SimpleFusion, AttentionFusion
from .encoders import ViewEncoder

__all__ = [
    "BEVNet",
    "positional_encoding",
    "BEVDetectorHead",
    "SimpleFusion",
    "AttentionFusion",
    "ViewEncoder",
]
