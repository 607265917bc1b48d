from dvmatcher_tpu.models.backbone import Uni3FC, pos_encoding_sin_wave
from dvmatcher_tpu.models.deformer import Deformer
from dvmatcher_tpu.models.layers import ConvBN, SALayer, N2PAttention

__all__ = [
    "Uni3FC",
    "Deformer",
    "ConvBN",
    "SALayer",
    "N2PAttention",
    "pos_encoding_sin_wave",
]
