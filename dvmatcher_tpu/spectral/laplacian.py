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
