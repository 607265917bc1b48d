"""Core geometry ops: pairwise distances, kNN, FPS, chamfer, rotations.

All ops are pure, jittable, mask-aware, and batched by `jax.vmap` (unbatched
cores are exported alongside batched wrappers). XLA-first; the Pallas
variants in `ops.pallas` replace the hot ones on TPU.
"""

from dvmatcher_tpu.ops.geometry import (
    sq_dist,
    cdist,
    safe_norm,
    index_points,
    index_points_single,
    knn_idx,
    knn_with_dist,
    masked_argmin,
)
from dvmatcher_tpu.ops.fps import farthest_point_sample
from dvmatcher_tpu.ops.chamfer import chamfer_squared, chamfer_loss
from dvmatcher_tpu.ops.rotation import (
    rotation_6d_to_matrix,
    matrix_to_rotation_6d,
    batch_rodrigues,
    rotate_z,
)
from dvmatcher_tpu.ops.metrics import (
    fscore,
    sinkhorn_emd,
    truncated_chamfer,
    gaussian_kl,
    neighborhood_statistics,
)
from dvmatcher_tpu.ops.rasterize import proj2img, i2p, three_views, piyg_colormap

__all__ = [
    "sq_dist",
    "cdist",
    "safe_norm",
    "index_points",
    "index_points_single",
    "knn_idx",
    "knn_with_dist",
    "masked_argmin",
    "farthest_point_sample",
    "chamfer_squared",
    "chamfer_loss",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
    "batch_rodrigues",
    "rotate_z",
    "fscore",
    "sinkhorn_emd",
    "truncated_chamfer",
    "gaussian_kl",
    "neighborhood_statistics",
    "proj2img",
    "i2p",
    "three_views",
    "piyg_colormap",
]
