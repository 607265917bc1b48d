from dvmatcher_tpu.match.soft import soft_correspondence, topk_sparsify, soft_project
from dvmatcher_tpu.match.hard import nn_correspondence

__all__ = [
    "soft_correspondence",
    "topk_sparsify",
    "soft_project",
    "nn_correspondence",
]
