from dvmatcher_tpu.match.soft import (
    pi_project,
    soft_correspondence,
    soft_project,
    topk_sparsify,
)
from dvmatcher_tpu.match.hard import nn_correspondence

__all__ = [
    "soft_correspondence",
    "topk_sparsify",
    "soft_project",
    "pi_project",
    "nn_correspondence",
]
