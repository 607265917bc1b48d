from dvmatcher_tpu.match.soft import (
    pi_project,
    soft_correspondence,
    soft_project,
    sparse_project,
    topk_soft_correspondence,
    topk_sparsify,
)
from dvmatcher_tpu.match.hard import nn_correspondence

__all__ = [
    "soft_correspondence",
    "topk_sparsify",
    "topk_soft_correspondence",
    "sparse_project",
    "soft_project",
    "pi_project",
    "nn_correspondence",
]
