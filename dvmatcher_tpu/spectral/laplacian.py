"""Cotangent Laplace-Beltrami operator + eigenbasis.

Rebuild of the reference's spectral mesh machinery (Tools/mesh.py:134-223:
cotan Laplacian, lumped mass matrix, on-disk-cached eigenbasis) used by the
functional-map toolbox and WKS descriptors. Assembly + eigensolve run on
the host (scipy.sparse / eigsh) as one-shot preprocessing, exactly as the
reference caches its `spectral/` directory; downstream spectral ops are
dense matmuls that run on device.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import eigsh


def cotan_laplacian(
    verts: np.ndarray, faces: np.ndarray
) -> tuple[sparse.csr_matrix, sparse.csr_matrix]:
    """Returns (stiffness L [positive semidefinite], lumped mass M)."""
    v = verts.astype(np.float64)
    f = faces.astype(np.int64)
    i1, i2, i3 = f[:, 0], f[:, 1], f[:, 2]
    e1 = v[i3] - v[i2]
    e2 = v[i1] - v[i3]
    e3 = v[i2] - v[i1]

    def cot(a, b):
        cross = np.cross(a, b)
        denom = np.linalg.norm(cross, axis=-1).clip(1e-12)
        return (a * b).sum(-1) / denom

    # cotangents opposite each edge
    c1 = cot(-e2, e3)  # angle at vertex 1, opposite edge e1=(i2,i3)
    c2 = cot(-e3, e1)
    c3 = cot(-e1, e2)

    ii = np.concatenate([i2, i3, i3, i1, i1, i2])
    jj = np.concatenate([i3, i2, i1, i3, i2, i1])
    w = 0.5 * np.concatenate([c1, c1, c2, c2, c3, c3])
    n = v.shape[0]
    W = sparse.csr_matrix((w, (ii, jj)), shape=(n, n))
    L = sparse.diags(np.asarray(W.sum(1)).ravel()) - W

    area = 0.5 * np.linalg.norm(np.cross(e3, -e2), axis=-1)
    m = np.zeros(n)
    for k in (i1, i2, i3):
        np.add.at(m, k, area / 3.0)
    M = sparse.diags(m).tocsr()
    return L.tocsr(), M


def lbo_eigenbasis(
    L: sparse.csr_matrix, M: sparse.csr_matrix, k: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """First k generalized eigenpairs L phi = lambda M phi.

    Returns (evals (k,), evects (N, k)), M-orthonormal, ascending."""
    evals, evects = eigsh(L, k=k, M=M, sigma=-1e-8, which="LM")
    order = np.argsort(evals)
    return evals[order], evects[:, order]


def _halfedges(faces: np.ndarray):
    """Half-edge arrays for a manifold triangle mesh.

    Half-edge h = c * F + f goes from faces[f, c] to faces[f, (c+1) % 3].
    Returns (src, dst, nxt, opp): nxt cycles within the face; opp is the
    twin half-edge (-1 on boundary)."""
    f = faces.astype(np.int64)
    nf = f.shape[0]
    src = np.concatenate([f[:, 0], f[:, 1], f[:, 2]])
    dst = np.concatenate([f[:, 1], f[:, 2], f[:, 0]])
    h = np.arange(3 * nf)
    nxt = (h + nf) % (3 * nf)
    # twin lookup via lexicographic sort of (min, max, direction)
    key = src * (f.max() + 1) + dst
    key_op = dst * (f.max() + 1) + src
    order = np.argsort(key, kind="stable")
    pos = np.searchsorted(key[order], key_op)
    pos = np.clip(pos, 0, len(order) - 1)
    cand = order[pos]
    opp = np.where(key[cand] == key_op, cand, -1)
    return src, dst, nxt, opp


def connection_laplacian(
    verts: np.ndarray, faces: np.ndarray
) -> sparse.csr_matrix:
    """Complex connection Laplacian (Sharp et al. 2019, The Vector Heat
    Method; reference Tools/mesh.py:327-387).

    Tangent planes are flattened by normalising each vertex's angle sum to
    2 pi; the half-edge (i -> j) is transported by
    rho_ij = (theta_ji + pi) - theta_ij where theta are the normalised
    cumulative angles of the outgoing edges in their vertices' local
    bases. Entries are the cotan weights rotated by exp(i rho)."""
    v = verts.astype(np.float64)
    f = faces.astype(np.int64)
    n = v.shape[0]
    nf = f.shape[0]

    src, dst, nxt, opp = _halfedges(f)
    if np.any(opp < 0):
        raise ValueError("connection Laplacian requires a closed manifold mesh")

    # internal angle at the ORIGIN corner of each half-edge: for h with
    # corner c, the angle at vertex f[:, c] between edges to the other two
    e_next = v[dst] - v[src]  # along the half-edge
    other = np.concatenate([f[:, 2], f[:, 0], f[:, 1]])  # third vertex
    e_prev = v[other] - v[src]

    def angle(a, b):
        cr = np.linalg.norm(np.cross(a, b), axis=-1)
        return np.arctan2(cr, (a * b).sum(-1))

    corner = angle(e_next, e_prev)  # (3F,) angle at src corner

    # normalise each vertex's total angle to 2 pi
    angle_sum = np.zeros(n)
    np.add.at(angle_sum, src, corner)
    corner_norm = corner * (2.0 * np.pi) / angle_sum[src]

    # cumulative angle of each outgoing half-edge in its vertex's local
    # basis: theta[start] = 0, then circulating h -> nxt[opp[h]] each new
    # outgoing edge adds the corner angle between it and the previous one
    # (which is exactly the new half-edge's origin-corner angle)
    start = np.zeros(n, dtype=np.int64)
    start[src] = np.arange(3 * nf, dtype=np.int64)  # any outgoing he per vertex

    theta = np.zeros(3 * nf)
    h_prev = start.copy()  # (n,) per-vertex cursor
    done = np.zeros(n, dtype=bool)
    for _ in range(128):  # max vertex degree bound
        h_new = nxt[opp[h_prev]]
        closed = h_new == start
        active = ~done & ~closed
        theta[h_new[active]] = (
            theta[h_prev[active]] + corner_norm[h_new[active]]
        )
        done |= closed
        h_prev = h_new
        if done.all():
            break
    assert done.all(), "vertex degree exceeded circulation bound"

    rho = (theta[opp] + np.pi) - theta
    r = np.exp(1j * rho)

    # cotan weight of each half-edge's face: angle at the OPPOSITE corner
    cot_angle = angle(v[src] - v[other], v[dst] - v[other])
    cot = 0.5 / np.tan(cot_angle)

    ii = np.concatenate([src, dst, src, dst])
    jj = np.concatenate([dst, src, src, dst])
    ww = np.concatenate([-cot * r[opp], -cot * r, cot + 0j, cot + 0j])
    a = sparse.csr_matrix((ww, (ii, jj)), shape=(n, n))
    return a


def connection_eigenbasis(
    cl: sparse.csr_matrix, M: sparse.csr_matrix, k: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """First k eigenpairs of the (Hermitian) connection Laplacian,
    generalized with the mass matrix (Tools/mesh.py:177-225)."""
    evals, evects = eigsh(cl, k=k, M=M.astype(np.complex128), sigma=-1e-6, which="LM")
    order = np.argsort(evals)
    return evals[order], evects[:, order]


def knn_graph_laplacian(
    verts: np.ndarray, k: int = 12
) -> tuple[sparse.csr_matrix, sparse.csr_matrix]:
    """Point-cloud Laplacian: symmetric heat-kernel kNN graph.

    w_ij = exp(-||vi-vj||^2 / sigma^2) over the symmetrised kNN graph,
    sigma = mean kNN distance; mass = lumped degree. A dependency-free
    stand-in for a point-cloud LBO where no faces exist (the reference
    reads most SCAPE shapes as meshes; raw point lists fall back to
    pp3d's point-cloud solver, dataset.py:165-168).
    """
    from scipy.spatial import cKDTree

    v = verts.astype(np.float64)
    n = v.shape[0]
    tree = cKDTree(v)
    dist, idx = tree.query(v, k=k + 1)
    dist, idx = dist[:, 1:], idx[:, 1:]
    sigma = dist.mean()
    w = np.exp(-(dist**2) / (sigma**2))
    rows = np.repeat(np.arange(n), k)
    W = sparse.csr_matrix((w.ravel(), (rows, idx.ravel())), shape=(n, n))
    W = W.maximum(W.T)
    deg = np.asarray(W.sum(1)).ravel()
    L = sparse.diags(deg) - W
    M = sparse.diags(deg / deg.mean())
    return L.tocsr(), M.tocsr()
