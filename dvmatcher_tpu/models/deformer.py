"""Deformer: per-graph-node 9-DoF (3 translation + 6d rotation) predictor.

Parity target: reference models/model.py:454-478.

Inputs per sample:
  * feat{1,2}_conv — per-point features stacked over their k nearest
    neighbors, (B, N, K, C); compressed over K by a learned weighted sum
    (the reference's Conv2d(k -> 1, kernel 1x1), models/model.py:462,468-469)
  * target features pulled through the soft map: feat2 <- Pi_12 @ feat2
  * rows gathered at the graph-node indices `node_idx`
  * MLP 262 -> [512, 256, 128] -> 9 with ELU (models/model.py:463)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvmatcher_tpu.models.layers import MLP, torch_bias_init, torch_kernel_init
from dvmatcher_tpu.ops.geometry import index_points


class Deformer(nn.Module):
    k: int = 10

    @nn.compact
    def __call__(
        self,
        feat1_conv: jax.Array,  # (B, N, K, C)
        feat2_conv: jax.Array,  # (B, M2, K, C)
        verts1: jax.Array,  # (B, N, 3)
        verts12: jax.Array,  # (B, N, 3) — Pi_12 @ verts2
        pi_12,  # dense (B, N, M2) | sparse (vals (B,N,k̂), idx (B,N,k̂))
        node_idx: jax.Array,  # (B, Mn) graph-node indices into N
    ) -> jax.Array:
        """Returns (B, Mn, 9): [:3] translations, [3:] 6d-rotation offsets
        (caller adds the identity 6d [1,0,0,0,1,0] before converting)."""
        # Conv2d(k->1): learned weighted sum over the K axis + scalar bias.
        w = self.param("neigh_weight", torch_kernel_init, (self.k, 1))
        b = self.param("neigh_bias", torch_bias_init(self.k), (1,))
        reduce = lambda f: jnp.einsum(
            "bnkc,ko->bnc", f, w, precision=jax.lax.Precision.HIGHEST
        ) + b
        feat1 = reduce(feat1_conv)
        feat2 = reduce(feat2_conv)

        if isinstance(pi_12, tuple):
            from dvmatcher_tpu.match.soft import sparse_project

            feat2 = sparse_project(pi_12[0], pi_12[1], feat2)  # (B, N, C)
        else:
            feat2 = jnp.matmul(
                pi_12, feat2, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (B, N, C)

        st_vts1 = index_points(verts1, node_idx)
        st_feat1 = index_points(feat1, node_idx)
        st_vts12 = index_points(verts12, node_idx)
        st_feat2 = index_points(feat2, node_idx)
        inp = jnp.concatenate([st_vts1, st_feat1, st_vts12, st_feat2], axis=-1)
        return MLP(features=(512, 256, 128), out=9)(inp)
