from .aocnet import AOCNet, SemanticEmbedding
from .decoder import CalibrationDecoding, DecoderMemory
from .deeplab import DeepLab, DeepLabASPP, DeepLabDecoder
from .layers import (
    GCT,
    ConditioningBlock,
    ConditioningLayer,
    DynamicPreHead,
    GNASPP,
    GNBottleneck,
    IAGate,
)
from .resnet import FrozenBatchNorm, ResNet101

__all__ = [
    "AOCNet",
    "CalibrationDecoding",
    "ConditioningBlock",
    "ConditioningLayer",
    "DecoderMemory",
    "DeepLab",
    "DeepLabASPP",
    "DeepLabDecoder",
    "DynamicPreHead",
    "FrozenBatchNorm",
    "GCT",
    "GNASPP",
    "GNBottleneck",
    "IAGate",
    "ResNet101",
    "SemanticEmbedding",
]
