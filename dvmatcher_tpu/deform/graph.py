"""Embedded deformation graphs: construction, skinning, ARAP.

Parity target: reference lib/deformation_graph_point.py:71-261
(`DeformationGraph_geod`, point-cloud/euclidean mode — the trained path) and
its per-step driver models/loss.py:1325-1337 (`deformation_graph_node`).

The reference builds the graph **on the CPU every training step** (torch →
numpy → scipy KDTree → torch), forcing a device round-trip per step. Here
the whole build is pure top-k/gather math in one jitted function, so it runs
on-device inside the train step — this is the single biggest host-sync the
TPU rebuild removes. Construction happens under `stop_gradient` exactly as
in the reference (graph built from detached verts).

Graph spec (construct_graph_euclidean, deformation_graph_point.py:177-201):
  * nodes   = FPS(verts, N//2)
  * one-ring = 9-NN among nodes (self included, distance-sorted)
  * each vertex is influenced by its k=3 nearest nodes (by provided
    "geodesic" matrix; the training path passes euclidean cdist)
  * sigma  = 20 x mean over vertices of the distance to their 2nd-NN
  * skinning weights w = exp(-d^2 / 2 sigma^2), row-normalised

Warp + energies (forward, deformation_graph_point.py:233-261):
  * v' = sum_j w_j [ R_j (v - g_j) + g_j + t_j ]
  * arap = sum_{i, j in ring(i)} ||(g_i+t_i) - (g_j+t_j) - R_i (g_i-g_j)||^2 / M
  * sr   = mean (R_i - R_j)^2 over ring pairs (returned, unused by the loss)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from dvmatcher_tpu.ops.geometry import sq_dist, knn_with_dist, knn_idx
from dvmatcher_tpu.ops.fps import farthest_point_sample


@struct.dataclass
class DeformGraph:
    """Static-shape deformation graph (a pytree; vmap-/jit-friendly)."""

    nodes_idx: jax.Array  # (M,) int32 — indices into the vertex array
    one_ring: jax.Array  # (M, R) int32 — node-to-node ring (self first)
    infl_idx: jax.Array  # (N, K) int32 — influencing nodes per vertex
    weights: jax.Array  # (N, K) f32 — row-normalised skinning weights


def build_graph(
    verts: jax.Array,
    *,
    num_nodes: int | None = None,
    start: jax.Array | int = 0,
    ring: int = 9,
    k: int = 3,
    sigma_scale: float = 20.0,
    geod: jax.Array | None = None,
) -> DeformGraph:
    """Build the embedded deformation graph for one (N, 3) cloud, on device.

    `geod` optionally supplies an (N, N) distance matrix for node-influence
    assignment (the reference training loss passes euclidean cdist —
    models/loss.py:1333 — which is the default here when omitted).
    """
    verts = jax.lax.stop_gradient(verts)
    n = verts.shape[0]
    m = n // 2 if num_nodes is None else num_nodes

    nodes_idx = farthest_point_sample(verts, m, start=start)
    nodes = verts[nodes_idx]

    one_ring = knn_idx(nodes, nodes, ring)

    if geod is None:
        d_vn = jnp.sqrt(sq_dist(verts, nodes))  # (N, M) euclidean
    else:
        d_vn = geod[:, nodes_idx]
    neg, infl_idx = jax.lax.top_k(-d_vn, k)
    dists = -neg  # (N, K)

    # sigma from euclidean 2nd-NN distance over the full cloud
    d2, _ = knn_with_dist(verts, verts, 2)
    sigma = sigma_scale * jnp.mean(jnp.sqrt(d2[:, 1]))

    w = jnp.exp(-(dists**2) / (2.0 * sigma * sigma))
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    return DeformGraph(
        nodes_idx=nodes_idx.astype(jnp.int32),
        one_ring=one_ring.astype(jnp.int32),
        infl_idx=infl_idx.astype(jnp.int32),
        weights=w.astype(jnp.float32),
    )


def skin(
    verts: jax.Array,
    graph: DeformGraph,
    rot: jax.Array,
    transl: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Warp one (N, 3) cloud by per-node transforms; return (v', arap, sr).

    rot: (M, 3, 3), transl: (M, 3).
    """
    g = verts[graph.nodes_idx]  # (M, 3)
    gv = g[graph.infl_idx]  # (N, K, 3)
    rv = rot[graph.infl_idx]  # (N, K, 3, 3)
    tv = transl[graph.infl_idx]  # (N, K, 3)

    local = verts[:, None, :] - gv  # (N, K, 3)
    warped = (
        jnp.einsum("nkij,nkj->nki", rv, local, precision=jax.lax.Precision.HIGHEST)
        + gv
        + tv
    )
    warped = jnp.sum(warped * graph.weights[..., None], axis=1)  # (N, 3)

    gi, ti, ri = g[:, None], transl[:, None], rot  # (M,1,3) / (M,3,3)
    gj = g[graph.one_ring]  # (M, R, 3)
    tj = transl[graph.one_ring]
    edge = gi - gj  # (M, R, 3)
    rotated = jnp.einsum(
        "mij,mrj->mri", ri, edge, precision=jax.lax.Precision.HIGHEST
    )
    diff = (gi + ti) - (gj + tj) - rotated
    arap = jnp.sum(diff**2) / graph.nodes_idx.shape[0]

    sr = jnp.mean((rot[:, None] - rot[graph.one_ring]) ** 2)
    return warped, arap, sr


def build_graph_batch(
    verts: jax.Array, *, starts: jax.Array | None = None, **kw
) -> DeformGraph:
    """vmap of `build_graph` over a (B, N, 3) batch.

    `starts` (B,) optional FPS seed indices (the reference seeds randomly
    per sample per step — models/model.py:54)."""
    b = verts.shape[0]
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    return jax.vmap(lambda v, s: build_graph(v, start=s, **kw))(verts, starts)


def skin_batch(
    verts: jax.Array, graph: DeformGraph, rot: jax.Array, transl: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """vmap of `skin`: verts (B,N,3), rot (B,M,3,3), transl (B,M,3).

    Returns (warped (B,N,3), arap (B,), sr (B,)). The reference sums arap
    over the batch (loss.py:1266-1273); callers do that reduction."""
    return jax.vmap(skin)(verts, graph, rot, transl)
