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
