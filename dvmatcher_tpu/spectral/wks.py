"""Wave Kernel Signature descriptors (port of misc/utils.py:376-439)."""

from __future__ import annotations

import numpy as np


def wks(
    evals: np.ndarray,
    evects: np.ndarray,
    energy_list: np.ndarray,
    sigma: float,
    scaled: bool = False,
) -> np.ndarray:
    """(N, num_E) WKS; eigenpairs with eval <= 1e-5 are dropped."""
    assert sigma > 0
    evals = np.asarray(evals).ravel()
    keep = evals > 1e-5
    evals = evals[keep]
    evects = evects[:, keep]

    e_list = np.asarray(energy_list)
    coefs = np.exp(
        -np.square(e_list[:, None] - np.log(np.abs(evals))[None, :])
        / (2 * sigma**2)
    )  # (num_E, K)
    weighted = evects[None] * coefs[:, None, :]  # (num_E, N, K)
    natural = np.einsum("tnk,nk->nt", weighted, evects)  # (N, num_E)
    if scaled:
        return natural / coefs.sum(1)[None, :]
    return natural


def auto_wks(evals: np.ndarray, evects: np.ndarray, num_e: int, scaled: bool = True):
    """Automatic energy range (misc/utils.py:376-401)."""
    abs_ev = np.sort(np.abs(evals))
    e_min, e_max = np.log(abs_ev[1]), np.log(abs_ev[-1])
    sigma = 7 * (e_max - e_min) / num_e
    e_min += 2 * sigma
    e_max -= 2 * sigma
    energy_list = np.linspace(e_min, e_max, num_e)
    return wks(abs_ev, evects, energy_list, sigma, scaled=scaled)


def wks_descriptors(
    verts: np.ndarray,
    faces: np.ndarray | None = None,
    num_e: int = 128,
    k_eig: int = 128,
    knn_k: int = 12,
) -> np.ndarray:
    """Per-point WKS anchor field, L2-normalised per point -> (N, num_e) f32.

    Serves as a *frozen intrinsic anchor* for training where the reference
    anchors the objective with lifted DINOv2/FeatUp visual features
    (reference train.py:72, models/dataset.py:159-194): WKS depends only on
    the LBO spectrum, so it is invariant to pose/deformation by
    construction — exactly the property the annealed-Pi objective needs to
    sharpen toward (see BASELINE.md "quality regression root cause").

    Mesh path: cotan LBO; point-cloud fallback: heat-kernel kNN-graph
    Laplacian (spectral.laplacian.knn_graph_laplacian).
    """
    from dvmatcher_tpu.spectral.laplacian import (
        cotan_laplacian,
        knn_graph_laplacian,
        lbo_eigenbasis,
    )

    if faces is not None and len(faces):
        L, M = cotan_laplacian(verts, faces)
    else:
        L, M = knn_graph_laplacian(verts, k=knn_k)
    k = min(k_eig, verts.shape[0] - 2)
    evals, evects = lbo_eigenbasis(L, M, k=k)
    d = auto_wks(evals, evects, num_e, scaled=True)
    d = d / np.linalg.norm(d, axis=1, keepdims=True).clip(1e-12)
    return d.astype(np.float32)
