"""One-pair registration: match with the backbone, warp with the Deformer.

Library form of the reference's standalone registration driver
(deform.py:132-262, point mode): soft map Pi = topk(softmax(-100 * cdist)),
Deformer 9-DoF per graph node, embedded-graph skinning — one jitted call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmatcher_tpu.deform.graph import build_graph_batch, skin_batch
from dvmatcher_tpu.match import soft_correspondence, soft_project, topk_sparsify
from dvmatcher_tpu.ops.geometry import index_points, knn_idx
from dvmatcher_tpu.ops.rotation import rotation_6d_to_matrix


def register_pair(
    deformer_apply,
    feat1: jax.Array,  # (B, N, C) source descriptors
    feat2: jax.Array,  # (B, M, C) target descriptors
    verts1: jax.Array,  # (B, N, 3)
    verts2: jax.Array,  # (B, M, 3)
    *,
    alpha: float = 100.0,
    pi_topk: int = 10,
    k_deform: int = 10,
    graph_starts: jax.Array | None = None,
    graphs1=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Warp verts1 onto verts2. Returns (warped (B,N,3), verts12, arap).

    `graphs1` optionally supplies precomputed batched deformation graphs
    (e.g. the qslim mesh-mode graph, deform.py:167-216); default is the
    on-device euclidean point-mode build."""
    pi_12 = topk_sparsify(soft_correspondence(feat1, feat2, alpha), pi_topk)
    verts12 = soft_project(pi_12, verts2)

    if graphs1 is None:
        graphs1 = build_graph_batch(verts1, starts=graph_starts)
    idx11 = knn_idx(verts1, verts1, k_deform)
    idx22 = knn_idx(verts2, verts2, k_deform)
    feat1_conv = index_points(feat1, idx11)
    feat2_conv = index_points(feat2, idx22)

    deformations = deformer_apply(
        feat1_conv, feat2_conv, verts1, verts12, pi_12, graphs1.nodes_idx
    )
    iden = jnp.array([1.0, 0, 0, 0, 1.0, 0], jnp.float32)
    rot = rotation_6d_to_matrix(deformations[..., 3:] + iden)
    transl = deformations[..., :3]
    warped, arap, _ = skin_batch(verts1, graphs1, rot, transl)
    return warped, verts12, jnp.sum(arap)
