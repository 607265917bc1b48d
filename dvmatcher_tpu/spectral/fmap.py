"""Functional-map <-> point-map conversions and ZoomOut refinement.

Ports of Tools/utils.py:69-84 (`fMap2pMap`/`pMap2fMap`) and :268-299
(`zo_fmap`). Conversions are dense matmul + nearest-neighbor searches —
done in JAX on device (the reference uses cKDTree on host).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.match import nn_correspondence


def fmap_to_pmap(b1: np.ndarray, b2: np.ndarray, c12: np.ndarray) -> np.ndarray:
    """T21: for each row of B2, nearest row of B1 @ C12^T
    (Tools/utils.py:69-77)."""
    d2, d1 = c12.shape
    q = jnp.asarray(b1[:, :d2] @ c12.T)
    t21 = nn_correspondence(jnp.asarray(b2[:, :d1])[None], q[None])[0]
    return np.asarray(t21)


def pmap_to_fmap(b1: np.ndarray, b2: np.ndarray, pmap: np.ndarray) -> np.ndarray:
    """C21 = pinv(B1) @ B2[pmap] (Tools/utils.py:79-81)."""
    return np.linalg.pinv(b1) @ b2[pmap]


def zoomout(
    b1: np.ndarray,
    b2: np.ndarray,
    c21_init: np.ndarray,
    k_init: int = 30,
    k_final: int = 50,
    k_step: int = 1,
    n_inner: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """ZoomOut spectral upsampling (Tools/utils.py:268-299).

    Returns (C21 at k_final, T12)."""
    t12 = fmap_to_pmap(b2, b1, c21_init)
    for k in range(k_init, k_final, k_step):
        for _ in range(n_inner):
            bb1 = b1[:, :k]
            bb2 = b2[:, :k]
            c21 = np.linalg.pinv(bb1) @ bb2[t12]
            t12 = fmap_to_pmap(bb2, bb1, c21)
    bb1 = b1[:, :k_final]
    bb2 = b2[:, :k_final]
    c21 = np.linalg.pinv(bb1) @ bb2[t12]
    return c21, t12


def bijective_pmaps(
    b1: np.ndarray, b2: np.ndarray, c12: np.ndarray, c21: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """One bijective map-refinement step (Tools/utils.py:85-107): couple
    the two directions by stacking the pulled-back bases (the bijective
    modification of C12/C21), then recover point maps from the DUAL
    spectral embedding [B @ C^T, B @ C] so each map respects both
    functional maps at once. Returns (T12, T21)."""
    t12 = fmap_to_pmap(b2, b1, c21)
    t21 = fmap_to_pmap(b1, b2, c12)

    c12 = np.linalg.pinv(np.concatenate([b2, b2[t12]], 0)) @ np.concatenate(
        [b1[t21], b1], 0
    )
    c21 = np.linalg.pinv(np.concatenate([b1[t21], b1], 0)) @ np.concatenate(
        [b2, b2[t12]], 0
    )

    def dual_nn(ba, bb, cab, cba):
        q = jnp.asarray(np.concatenate([bb @ cba.T, bb @ cab], axis=1))
        a = jnp.asarray(np.concatenate([ba, ba], axis=1))
        return np.asarray(nn_correspondence(a[None], q[None])[0])

    t12 = dual_nn(b1, b2, c12, c21)
    t21 = dual_nn(b2, b1, c21, c12)
    return t12, t21


def bijective_zoomout(
    b1: np.ndarray,
    b2: np.ndarray,
    c12_init: np.ndarray,
    c21_init: np.ndarray,
    k_init: int = 10,
    k_step: int = 1,
    k_final: int = 30,
    n_inner: int = 2,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bijective ZoomOut (Tools/utils.py:225-266, `func_bijective_zm_fmap`
    without the Q-/complex-symmetry step — wQ machinery operates on the
    vestigial gpdir operators the shipped pipeline never builds): grow the
    spectral dimension, refining BOTH directions jointly with the
    bijective coupling each step. Returns (C12, C21, T12, T21)."""
    t12 = fmap_to_pmap(b2, b1, c21_init)
    t21 = fmap_to_pmap(b1, b2, c12_init)
    for k in range(k_init, k_final, k_step):
        for _ in range(n_inner):
            bb1, bb2 = b1[:, :k], b2[:, :k]
            c12 = np.linalg.pinv(bb2) @ bb1[t21]
            c21 = np.linalg.pinv(bb1) @ bb2[t12]
            t12, t21 = bijective_pmaps(bb1, bb2, c12, c21)
    bb1, bb2 = b1[:, :k_final], b2[:, :k_final]
    c21 = np.linalg.pinv(bb1) @ bb2[t12]
    c12 = np.linalg.pinv(bb2) @ bb1[t21]
    return c12, c21, t12, t21


def convert_c(phi1, phi2, a1, a2, alpha: float, n_eig: int = 50):
    """Soft-map functional-map conversion (reference test.py:54-63
    `convert_C`, legacy eval path): truncate the bases to `n_eig`,
    synthesise descriptors D = Phi @ A, build soft maps
    T = softmax(-alpha * cdist) both ways, and recover
    C12 = pinv(Phi2) @ T21 @ Phi1 (and symmetrically C21).

    phi*: (N, K>=n_eig) eigenbases; a*: (n_eig_full, C) spectral
    descriptor coefficients (rows beyond n_eig ignored). numpy in/out.
    """
    p1 = np.asarray(phi1)[:, :n_eig]
    p2 = np.asarray(phi2)[:, :n_eig]
    d1 = p1 @ np.asarray(a1)[:n_eig]
    d2 = p2 @ np.asarray(a2)[:n_eig]

    def soft(x, y):
        d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        d = np.sqrt(np.maximum(d, 0.0))
        e = -alpha * d
        e -= e.max(axis=-1, keepdims=True)
        w = np.exp(e)
        return w / w.sum(axis=-1, keepdims=True)

    t12 = soft(d1, d2)
    t21 = soft(d2, d1)
    c12 = np.linalg.pinv(p2) @ (t21 @ p1)
    c21 = np.linalg.pinv(p1) @ (t12 @ p2)
    return c12, c21
