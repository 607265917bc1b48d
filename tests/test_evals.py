"""Eval-harness tests: perfect features give zero error; corrupted maps
give positive error proportional to geodesic displacement."""

import numpy as np
import pytest

from dvmatcher_tpu.evals import (
    calculate_geodesic_error,
    off_diagonal_mean,
    pair_geodesic_error,
    evaluate_feature_dir,
)


def _ring(n):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    verts = np.stack([np.cos(t), np.sin(t), 0 * t], -1)
    # exact ring geodesics
    idx = np.arange(n)
    hops = np.minimum((idx[None] - idx[:, None]) % n, (idx[:, None] - idx[None]) % n)
    return verts, hops * (2 * np.pi / n)


def test_perfect_features_zero_error():
    n = 40
    verts, m = _ring(n)
    phi = np.random.default_rng(0).normal(size=(n, 16))
    vts = np.arange(n)
    errs = pair_geodesic_error(phi, phi, vts, vts, m)
    np.testing.assert_allclose(errs, 0.0)


def test_shifted_map_error_is_hop_distance():
    n = 40
    verts, m = _ring(n)
    rngphi = np.random.default_rng(0).normal(size=(n, 16))
    # target features rolled by one: predicted index = gt+1 -> one hop
    phi_t = np.roll(rngphi, -1, axis=0)
    vts = np.arange(n)
    errs = pair_geodesic_error(rngphi, phi_t, vts, vts, m)
    np.testing.assert_allclose(errs, 2 * np.pi / n, rtol=1e-6)


def test_calculate_geodesic_error_port():
    n = 30
    _, m = _ring(n)
    corr = np.arange(n)
    p2p = (np.arange(n) + 2) % n  # two hops off
    err = calculate_geodesic_error(m, corr, corr, p2p)
    np.testing.assert_allclose(err, 2 * (2 * np.pi / n), rtol=1e-6)


def test_off_diagonal_mean():
    a = np.ones((3, 3)) * 5
    np.fill_diagonal(a, 99)
    assert off_diagonal_mean(a) == 5


def test_evaluate_feature_dir_end_to_end(tmp_path):
    import scipy.io as sio

    n = 24
    verts, m = _ring(n)
    rng = np.random.default_rng(1)
    phi = rng.normal(size=(n, 8))
    names = ["a", "b"]
    for name in names:
        sio.savemat(tmp_path / f"usefeature_{name}.mat", {"uphi": phi})
    vts = {nm: np.arange(n) for nm in names}
    geo = {nm: m for nm in names}
    arr, avg = evaluate_feature_dir(str(tmp_path), names, vts, geo)
    assert arr.shape == (2, 2)
    np.testing.assert_allclose(avg, 0.0)
