"""Rotation-representation tests (reference models/loss.py:28-45,
lib/utils.py:70-112)."""

import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.ops import (
    batch_rodrigues,
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
    rotate_z,
)


def test_identity_6d():
    iden = jnp.array([1.0, 0, 0, 0, 1.0, 0])
    r = np.asarray(rotation_6d_to_matrix(iden))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_6d_roundtrip(rng):
    # random rotations via QR
    m = rng.normal(size=(8, 3, 3))
    q, _ = np.linalg.qr(m)
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1  # force proper rotations
    d6 = matrix_to_rotation_6d(jnp.asarray(q, jnp.float32))
    r = np.asarray(rotation_6d_to_matrix(d6))
    # 6d uses the first two columns; Gram-Schmidt reproduces R^T stacked as
    # rows -> rows of result are columns of q, i.e. result == q^T? No:
    # b1 = col0(q), b2 = col1(q), b3 = col0 x col1 = col2 for proper rotations;
    # stacked as rows -> result == q^T. Verify orthogonality + reconstruction.
    np.testing.assert_allclose(r, np.swapaxes(q, -1, -2), atol=1e-5)


def test_6d_output_is_rotation(rng):
    d6 = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    r = np.asarray(rotation_6d_to_matrix(d6))
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_rodrigues_z_axis():
    angle = 0.7
    r = np.asarray(batch_rodrigues(jnp.array([[0.0, 0.0, angle]])))
    c, s = np.cos(angle), np.sin(angle)
    want = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    np.testing.assert_allclose(r[0], want, atol=1e-5)


def test_rotate_z_convention(rng):
    pts = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    got = np.asarray(rotate_z(pts, -np.pi / 2))
    # points @ Rz: x' = x*c + y*s, y' = -x*s + y*c with c=cos(-pi/2)=0, s=-1
    p = np.asarray(pts)
    want = np.stack([-p[..., 1], p[..., 0], p[..., 2]], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
