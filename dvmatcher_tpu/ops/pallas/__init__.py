"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA reference implementation in the main ops/models
modules; these replace them on TPU where fusion pays. Availability is
feature-gated: import errors or non-TPU backends fall back to XLA.
"""

from dvmatcher_tpu.ops.pallas.knn_attention import knn_attention, knn_attention_xla
from dvmatcher_tpu.ops.pallas.pi_search import nn_argmin, pi_matmul

__all__ = ["knn_attention", "knn_attention_xla", "nn_argmin", "pi_matmul"]
