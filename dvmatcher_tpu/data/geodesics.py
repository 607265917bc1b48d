"""Geodesic distance matrices for supervision and evaluation.

The reference precomputes per-shape N x N geodesic matrices with
potpourri3d's point-cloud heat solver (dataset.py:49-54) and, for the eval
harness, Dijkstra over the mesh adjacency weighted by euclidean edge
lengths (misc/utils_geod.py:79-105). Both run on the host once and are
cached; we do the same with scipy (C-speed Dijkstra), swapping the heat
solver for shortest paths over a kNN graph on point clouds — the supervision
consumes distance *profiles* compared by cosine, which is robust to the
graph-metric approximation. A future on-device heat-method solve (sparse CG
in XLA) can slot in behind the same interface.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import shortest_path


def _sym(m: csr_matrix) -> csr_matrix:
    return m.maximum(m.T)


def _all_pairs(adj: csr_matrix) -> np.ndarray:
    """All-pairs shortest paths: native OpenMP Dijkstra when built, scipy
    otherwise."""
    from dvmatcher_tpu.data import native

    adj = csr_matrix(adj)
    if native.available():
        out = native.dijkstra_all(adj.indptr, adj.indices, adj.data)
        if out is not None:
            return out
    return shortest_path(adj, directed=False).astype(np.float32)


def knn_graph_geodesics(verts: np.ndarray, k: int = 12) -> np.ndarray:
    """All-pairs graph geodesics on a point cloud via a kNN graph.

    Replacement for pp3d.PointCloudHeatSolver column sweeps (dataset.py:49-54).
    """
    from sklearn.neighbors import kneighbors_graph

    g = kneighbors_graph(verts, n_neighbors=k, mode="distance", include_self=False)
    d = _all_pairs(_sym(csr_matrix(g)))
    if np.any(np.isinf(d)):
        # disconnected kNN graph: densify until connected
        return knn_graph_geodesics(verts, k * 2)
    return d.astype(np.float32)


def mesh_geodesics(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Dijkstra over mesh edges weighted by euclidean length
    (port of misc/utils_geod.py:79-105 without the trimesh/networkx deps)."""
    n = verts.shape[0]
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    w = np.linalg.norm(verts[e[:, 0]] - verts[e[:, 1]], axis=-1)
    adj = csr_matrix((w, (e[:, 0], e[:, 1])), shape=(n, n))
    d = _all_pairs(_sym(adj))
    if np.any(np.isinf(d)):
        raise ValueError("mesh graph not connected")
    return d.astype(np.float32)


def geodesics(verts: np.ndarray, faces: np.ndarray | None, knn_k: int = 12) -> np.ndarray:
    """Mesh Dijkstra when faces exist, kNN-graph geodesics otherwise."""
    if faces is not None and len(faces) > 0:
        return mesh_geodesics(verts, faces)
    return knn_graph_geodesics(verts, knn_k)
