"""Unit tests for core geometry ops against numpy oracles that replicate the
reference formulas (misc/utils.py:7-18, models/model.py:48-63,255-264,
models/loss.py:91-124)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvmatcher_tpu.ops import (
    cdist,
    chamfer_loss,
    chamfer_squared,
    farthest_point_sample,
    index_points,
    knn_idx,
    masked_argmin,
    safe_norm,
    sq_dist,
)


def _np_sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def test_sq_dist_matches_bruteforce(rng):
    a = rng.normal(size=(50, 3)).astype(np.float32)
    b = rng.normal(size=(70, 3)).astype(np.float32)
    got = np.asarray(sq_dist(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_sqdist(a, b), rtol=1e-4, atol=1e-5)


def test_cdist_grad_safe_at_zero():
    x = jnp.zeros((1, 3))
    g = jax.grad(lambda v: cdist(v, jnp.zeros((1, 3))).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda v: safe_norm(v).sum())(jnp.zeros((4, 3)))
    assert np.all(np.asarray(g2) == 0.0)


def test_knn_idx_oracle(rng):
    a = rng.normal(size=(2, 40, 8)).astype(np.float32)
    b = rng.normal(size=(2, 60, 8)).astype(np.float32)
    got = np.asarray(knn_idx(jnp.asarray(a), jnp.asarray(b), 5))
    for bi in range(2):
        d = _np_sqdist(a[bi], b[bi])
        want = np.argsort(d, axis=-1, kind="stable")[:, :5]
        got_d = np.take_along_axis(d, got[bi], axis=-1)
        want_d = np.take_along_axis(d, want, axis=-1)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)


def test_knn_self_includes_self(rng):
    a = jnp.asarray(rng.normal(size=(1, 30, 3)).astype(np.float32))
    idx = np.asarray(knn_idx(a, a, 4))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(30))


def test_knn_mask_excludes_padding(rng):
    a = jnp.asarray(rng.normal(size=(1, 10, 3)).astype(np.float32))
    mask = jnp.arange(10) < 6
    idx = np.asarray(knn_idx(a, a, 3, mask_b=mask[None]))
    assert idx.max() < 6


def test_index_points(rng):
    pts = rng.normal(size=(2, 20, 4)).astype(np.float32)
    idx = rng.integers(0, 20, size=(2, 7, 3))
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b][idx[b]])


def test_fps_matches_reference_loop(rng):
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    npoint = 16
    # numpy oracle replicating models/model.py:48-63 with start=0
    centroids = np.zeros(npoint, np.int64)
    distance = np.full(64, 1e10, np.float32)
    farthest = 0
    for i in range(npoint):
        centroids[i] = farthest
        d = ((xyz - xyz[farthest]) ** 2).sum(-1)
        distance = np.minimum(distance, d)
        farthest = int(distance.argmax())
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), npoint, start=0))
    np.testing.assert_array_equal(got, centroids)


def test_fps_respects_mask(rng):
    xyz = rng.normal(size=(32, 3)).astype(np.float32)
    mask = np.arange(32) < 20
    got = np.asarray(
        farthest_point_sample(jnp.asarray(xyz), 10, start=3, mask=jnp.asarray(mask))
    )
    assert got.max() < 20
    assert len(set(got.tolist())) == 10


def test_chamfer_oracle(rng):
    a = rng.normal(size=(1, 30, 3)).astype(np.float32)
    b = rng.normal(size=(1, 40, 3)).astype(np.float32)
    d = _np_sqdist(a[0], b[0])
    da, db, ia, ib = map(np.asarray, chamfer_squared(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(da[0], d.min(-1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(db[0], d.min(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(ia[0], d.argmin(-1))
    np.testing.assert_array_equal(ib[0], d.argmin(0))
    loss = float(chamfer_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(loss, d.min(-1).mean() + d.min(0).mean(), rtol=1e-4)


def test_chamfer_masked_equals_sliced(rng):
    a = rng.normal(size=(1, 30, 3)).astype(np.float32)
    b = rng.normal(size=(1, 40, 3)).astype(np.float32)
    ma = np.arange(30) < 25
    mb = np.arange(40) < 33
    masked = float(
        chamfer_loss(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(ma)[None], jnp.asarray(mb)[None]
        )
    )
    sliced = float(chamfer_loss(jnp.asarray(a[:, :25]), jnp.asarray(b[:, :33])))
    np.testing.assert_allclose(masked, sliced, rtol=1e-5)


def test_masked_argmin(rng):
    d = jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))
    mask = jnp.arange(9) < 5
    val, idx = masked_argmin(d, mask)
    assert np.asarray(idx).max() < 5
    np.testing.assert_allclose(
        np.asarray(val), np.asarray(d)[:, :5].min(-1), rtol=1e-6
    )
