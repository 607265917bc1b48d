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


def test_euclidean_error_normalisation():
    """Unit right-triangle pair: hand-computable area + displacement."""
    from dvmatcher_tpu.evals.geodesic_error import euclidean_error

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float64
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    # area = 1.0; pred maps 0->1 (dist 1), others exact -> mean 0.25
    pred = np.array([1, 1, 2, 3])
    gt = np.array([0, 1, 2, 3])
    err = euclidean_error(verts, faces, pred, gt)
    assert abs(err - 0.25) < 1e-12


def test_write_ply_roundtrippable(tmp_path):
    from dvmatcher_tpu.data.off_io import write_ply

    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.array([[0, 1, 2]])
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    p = tmp_path / "m.ply"
    write_ply(str(p), verts, faces, colors)
    txt = p.read_text().splitlines()
    assert txt[0] == "ply"
    assert "element vertex 3" in txt
    assert "element face 1" in txt
    body = txt[txt.index("end_header") + 1 :]
    assert body[0].split()[3:] == ["255", "0", "0"]
    assert body[-1] == "3 0 1 2"
