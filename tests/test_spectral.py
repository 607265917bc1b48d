"""Spectral toolbox tests on a real SCAPE mesh + analytic sanity checks."""

import numpy as np
import pytest

from dvmatcher_tpu.data import read_off
from dvmatcher_tpu.spectral import (
    auto_wks,
    cotan_laplacian,
    fmap_to_pmap,
    lbo_eigenbasis,
    pmap_to_fmap,
    zoomout,
)


@pytest.fixture(scope="module")
def scape_basis():
    verts, faces = read_off("/root/reference/data/scape_r/shapes_test/mesh052.off")
    L, M = cotan_laplacian(verts, faces)
    evals, evects = lbo_eigenbasis(L, M, k=40)
    return verts, faces, L, M, evals, evects


def test_laplacian_properties(scape_basis):
    verts, faces, L, M, evals, evects = scape_basis
    # symmetric, rows sum to ~0, constant in nullspace
    assert abs(L - L.T).max() < 1e-8
    ones = np.ones(L.shape[0])
    assert np.abs(L @ ones).max() < 1e-6
    # mass = total area
    area_total = M.diagonal().sum()
    assert area_total > 0


def test_eigenbasis(scape_basis):
    verts, faces, L, M, evals, evects = scape_basis
    assert evals[0] < 1e-6  # constant eigenfunction
    assert np.all(np.diff(evals) >= -1e-8)
    # M-orthonormal
    gram = evects.T @ (M @ evects)
    np.testing.assert_allclose(gram, np.eye(40), atol=1e-6)


def test_wks_shapes(scape_basis):
    verts, faces, L, M, evals, evects = scape_basis
    w = auto_wks(evals, evects, num_e=32)
    assert w.shape == (verts.shape[0], 32)
    assert np.all(np.isfinite(w))
    assert w.min() >= 0


def test_fmap_identity_roundtrip(scape_basis):
    verts, faces, L, M, evals, evects = scape_basis
    b = evects[:, :20]
    # identity functional map -> identity point map
    t = fmap_to_pmap(b, b, np.eye(20))
    frac_fixed = (t == np.arange(len(t))).mean()
    assert frac_fixed > 0.95
    c = pmap_to_fmap(b, b, np.arange(b.shape[0]))
    np.testing.assert_allclose(c, np.eye(20), atol=1e-4)


def test_zoomout_improves_identity(scape_basis):
    verts, faces, L, M, evals, evects = scape_basis
    b = evects
    c_noisy = np.eye(10) + 0.05 * np.random.default_rng(0).normal(size=(10, 10))
    c_ref, t12 = zoomout(b, b, c_noisy, k_init=10, k_final=30, k_step=5)
    acc = (t12 == np.arange(len(t12))).mean()
    assert acc > 0.7, acc


def _octa_sphere(subdiv=2):
    """Closed manifold triangle mesh: subdivided octahedron on the sphere."""
    verts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        float,
    )
    faces = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    )
    for _ in range(subdiv):
        mid = {}
        new_faces = []
        vlist = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = vlist[a] + vlist[b]
                m = m / np.linalg.norm(m)
                mid[key] = len(vlist)
                vlist.append(m)
            return mid[key]

        for f in faces:
            a, b, c = f
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces)
    return verts, faces


def test_connection_laplacian_hermitian_and_solvable():
    from dvmatcher_tpu.spectral import (
        connection_eigenbasis,
        connection_laplacian,
        cotan_laplacian,
    )

    verts, faces = _octa_sphere(2)
    cl = connection_laplacian(verts, faces)
    assert cl.dtype == np.complex128
    herm_err = abs(cl - cl.getH()).max()
    assert herm_err < 1e-10, herm_err
    _, M = cotan_laplacian(verts, faces)
    vals, vecs = connection_eigenbasis(cl, M, k=8)
    assert np.all(vals > -1e-6)  # PSD up to roundoff
    assert vecs.shape == (len(verts), 8) and vecs.dtype == np.complex128


def test_bijective_zoomout_recovers_isometry():
    """On an exact 'isometry' (permuted eigenbasis) a corrupted initial
    map must be cleaned up by bijective zoomout."""
    from dvmatcher_tpu.spectral import bijective_zoomout

    rng = np.random.default_rng(0)
    n, kf = 80, 24
    b1 = np.linalg.qr(rng.normal(size=(n, kf)))[0]
    perm = rng.permutation(n)
    b2 = b1[perm]  # shape2 point p corresponds to shape1 point perm[p]

    # ground truth T21 maps shape2 -> shape1: b2[p] == b1[perm[p]]
    t21_gt = perm
    t12_gt = np.argsort(perm)

    # corrupt 30% of the initial maps
    def corrupt(t):
        t = t.copy()
        bad = rng.choice(n, n * 3 // 10, replace=False)
        t[bad] = rng.integers(0, n, len(bad))
        return t

    k0 = 6
    c12 = np.linalg.pinv(b2[:, :k0]) @ b1[:, :k0][corrupt(t21_gt)]
    c21 = np.linalg.pinv(b1[:, :k0]) @ b2[:, :k0][corrupt(t12_gt)]
    _, _, t12, t21 = bijective_zoomout(
        b1, b2, c12, c21, k_init=k0, k_final=kf, k_step=2, n_inner=2
    )
    assert (t12 == t12_gt).mean() > 0.95, (t12 == t12_gt).mean()
    assert (t21 == t21_gt).mean() > 0.95, (t21 == t21_gt).mean()


def test_convert_c_identity_bases():
    """Identical shapes + orthonormal basis: convert_C recovers ~identity
    functional maps (reference test.py:54-63)."""
    from dvmatcher_tpu.spectral.fmap import convert_c

    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((120, 50)))
    a = rng.standard_normal((50, 20))
    c12, c21 = convert_c(q, q, a, a, alpha=1000.0, n_eig=50)
    np.testing.assert_allclose(c12, np.eye(50), atol=1e-3)
    np.testing.assert_allclose(c21, np.eye(50), atol=1e-3)
