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


def test_rotation_5d_hopf_10d_produce_rotations():
    """All toolbox representations must land on SO(3): R R^T = I, det = 1."""
    import jax

    from dvmatcher_tpu.ops.rotation import (
        rotation_5d_to_matrix,
        rotation_10d_to_matrix,
        rotation_hopf_to_matrix,
        sample_rotations_axis_angle,
        sample_rotations_hopf,
        sample_rotations_quat,
    )

    key = jax.random.PRNGKey(0)
    mats = [
        rotation_5d_to_matrix(jax.random.normal(key, (7, 5))),
        rotation_hopf_to_matrix(jax.random.normal(key, (7, 3))),
        rotation_10d_to_matrix(jax.random.normal(key, (7, 10))),
        sample_rotations_quat(key, 7),
        sample_rotations_hopf(key, 7),
        sample_rotations_axis_angle(key, 7, 1.0 / 6.0),
    ]
    for r in mats:
        r = np.asarray(r)
        np.testing.assert_allclose(
            r @ r.transpose(0, 2, 1), np.eye(3)[None].repeat(7, 0), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_hopf_matches_reference_formula():
    """Hopf -> quaternion -> matrix against the tools.py:235-267 formula
    transcribed in numpy."""
    from dvmatcher_tpu.ops.rotation import rotation_hopf_to_matrix

    rng = np.random.default_rng(0)
    hopf = rng.normal(size=(5, 3)).astype(np.float32)
    theta = (np.tanh(hopf[:, 0]) + 1) * np.pi / 2
    phi = (np.tanh(hopf[:, 1]) + 1) * np.pi
    tao = (np.tanh(hopf[:, 2]) + 1) * np.pi
    qw = np.cos(theta / 2) * np.cos(tao / 2)
    qx = np.cos(theta / 2) * np.sin(tao / 2)
    qy = np.sin(theta / 2) * np.cos(phi + tao / 2)
    qz = np.sin(theta / 2) * np.sin(phi + tao / 2)
    want = np.stack(
        [
            np.stack([1 - 2 * qy**2 - 2 * qz**2, 2 * qx * qy - 2 * qz * qw,
                      2 * qx * qz + 2 * qy * qw], -1),
            np.stack([2 * qx * qy + 2 * qz * qw, 1 - 2 * qx**2 - 2 * qz**2,
                      2 * qy * qz - 2 * qx * qw], -1),
            np.stack([2 * qx * qz - 2 * qy * qw, 2 * qy * qz + 2 * qx * qw,
                      1 - 2 * qx**2 - 2 * qy**2], -1),
        ],
        axis=-2,
    )
    got = np.asarray(rotation_hopf_to_matrix(jnp.asarray(hopf)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_geodesic_distance():
    from dvmatcher_tpu.ops.rotation import (
        rotation_geodesic_distance,
        rotate_z,
        _axis_matrix,
    )

    r1 = _axis_matrix(0.3, "z")[None]
    r2 = _axis_matrix(1.0, "z")[None]
    np.testing.assert_allclose(
        np.asarray(rotation_geodesic_distance(r1, r2)), [0.7], atol=1e-5
    )
