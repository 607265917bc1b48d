"""Kabsch / ICP tests against analytic rigid transforms."""

import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.ops.procrustes import icp, kabsch
from dvmatcher_tpu.ops.rotation import rotation_6d_to_matrix


def _rigid(rng, n=50, scale=1.0):
    src = rng.normal(size=(1, n, 3)).astype(np.float32)
    r = np.asarray(
        rotation_6d_to_matrix(jnp.asarray(rng.normal(size=6), jnp.float32))
    )
    t = rng.normal(size=3).astype(np.float32)
    tgt = scale * src @ r.T + t  # x' = s R x + t (column convention)
    return src, tgt, r, t


def test_kabsch_recovers_rigid(rng):
    src, tgt, r, t = _rigid(rng)
    R, T, s = kabsch(jnp.asarray(src), jnp.asarray(tgt))
    # row convention: src @ R + T == tgt  =>  R == r.T
    np.testing.assert_allclose(np.asarray(R)[0], r.T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T)[0], t, atol=1e-5)
    aligned = src @ np.asarray(R)[0] + np.asarray(T)[0]
    np.testing.assert_allclose(aligned, tgt, atol=1e-5)


def test_kabsch_with_scale(rng):
    src, tgt, r, t = _rigid(rng, scale=1.7)
    R, T, s = kabsch(jnp.asarray(src), jnp.asarray(tgt), estimate_scale=True)
    np.testing.assert_allclose(float(s[0]), 1.7, rtol=1e-4)
    aligned = 1.7 * src @ np.asarray(R)[0] + np.asarray(T)[0]
    np.testing.assert_allclose(aligned, tgt, atol=1e-4)


def test_kabsch_weighted_ignores_outlier(rng):
    src, tgt, r, t = _rigid(rng)
    tgt_out = tgt.copy()
    tgt_out[0, 0] += 100.0  # corrupt one correspondence
    w = np.ones((1, src.shape[1]), np.float32)
    w[0, 0] = 0.0
    R, T, _ = kabsch(jnp.asarray(src), jnp.asarray(tgt_out), jnp.asarray(w))
    aligned = src @ np.asarray(R)[0] + np.asarray(T)[0]
    np.testing.assert_allclose(aligned[0, 1:], tgt[0, 1:], atol=1e-4)


def test_icp_converges_small_perturbation(rng):
    # ICP is local: use a small rigid offset (as in refinement use-cases)
    src = rng.normal(size=(1, 120, 3)).astype(np.float32)
    r = np.asarray(
        rotation_6d_to_matrix(
            jnp.asarray([1.0, 0.05, -0.04, 0.03, 1.0, 0.06], jnp.float32)
        )
    )
    t = np.array([0.02, -0.01, 0.03], np.float32)
    tgt = src @ r.T + t
    aligned, R, T, rmse = icp(jnp.asarray(src), jnp.asarray(tgt), iters=30)
    assert float(rmse[0]) < 1e-3, float(rmse[0])
