"""Rotation representations.

Parity targets:
  * 6d <-> matrix: reference models/loss.py:28-45 (Zhou et al. continuity
    representation; rows of R are the Gram-Schmidt frame).
  * axis-angle -> matrix via quaternion: reference lib/utils.py:70-112
    (`batch_rodrigues`/`quat2mat`).
  * fixed-axis rotation: reference models/model.py:65-94
    (`rotate_point_cloud_batch_torch`, used for the -pi/2 z-rotation in the
    view projection pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3); rows (b1, b2, b3) stacked along axis -2."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(r: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two *columns* concatenated
    (reference models/loss.py:28-37)."""
    return jnp.concatenate([r[..., :, 0], r[..., :, 1]], axis=-1)


def batch_rodrigues(axisang: jax.Array) -> jax.Array:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3) via quaternions."""
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_matrix(quat)


def quat_to_matrix(quat: jax.Array) -> jax.Array:
    """(w, x, y, z) quaternion (..., 4) -> (..., 3, 3)."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def _axis_matrix(angle: float, axis: str) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    if axis == "z":
        return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    if axis == "y":
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], jnp.float32)
    if axis == "x":
        return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]], jnp.float32)
    raise ValueError(f"axis must be x, y or z, got {axis}")


def rotate_z(points: jax.Array, angle: float) -> jax.Array:
    """Rotate (..., N, 3) points: `points @ Rz(angle)` — this matches the
    reference's `rotated = cloud^T @ R` convention (models/model.py:93)."""
    return points @ _axis_matrix(angle, "z")


# --- rotation toolbox extras (reference misc/scirpts/tools.py) -------------
# The robustness-eval scripts sample rotations in several representations;
# these are the remaining ones (5d stereographic, Hopf, 10d symmetric-
# matrix) and their samplers, jax-native.


def _ortho6d_to_matrix_cols(b6: jax.Array) -> jax.Array:
    """tools.py:82-97 column convention: 6d -> (..., 3, 3) whose COLUMNS
    are the Gram-Schmidt frame (x, cross-derived y, z)."""
    x_raw, y_raw = b6[..., :3], b6[..., 3:]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True).clip(1e-12)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(1e-12)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def stereographic_unproject(a: jax.Array, axis: int = 0) -> jax.Array:
    """Inverse stereographic projection, +1 dimension (tools.py:140-155)."""
    s2 = jnp.sum(a * a, axis=-1, keepdims=True)
    unproj = 2.0 * a / (s2 + 1.0)
    w = (s2 - 1.0) / (s2 + 1.0)
    return jnp.concatenate([unproj[..., :axis], w, unproj[..., axis:]], axis=-1)


def rotation_5d_to_matrix(a: jax.Array) -> jax.Array:
    """(..., 5) -> (..., 3, 3) (tools.py:160-171): stereographic unproject
    of the scaled last three components, renormalised, fed to ortho6d."""
    scale = jnp.asarray(
        [jnp.sqrt(2.0) + 1.0, jnp.sqrt(2.0) + 1.0, jnp.sqrt(2.0)], a.dtype
    )
    u = stereographic_unproject(a[..., 2:5] * scale, axis=0)  # (..., 4)
    norm = jnp.linalg.norm(u[..., 1:], axis=-1, keepdims=True).clip(1e-12)
    u = u / norm
    return _ortho6d_to_matrix_cols(jnp.concatenate([a[..., 0:2], u], axis=-1))


def rotation_hopf_to_matrix(hopf: jax.Array) -> jax.Array:
    """(..., 3) tanh-squashed Hopf coordinates -> (..., 3, 3)
    (tools.py:235-267): theta in [0, pi], phi and tao in [0, 2pi)."""
    theta = (jnp.tanh(hopf[..., 0]) + 1.0) * jnp.pi / 2.0
    phi = (jnp.tanh(hopf[..., 1]) + 1.0) * jnp.pi
    tao = (jnp.tanh(hopf[..., 2]) + 1.0) * jnp.pi
    return quat_to_matrix(_hopf_quat(theta, phi, tao))


def _hopf_quat(theta, phi, tao) -> jax.Array:
    qw = jnp.cos(theta / 2) * jnp.cos(tao / 2)
    qx = jnp.cos(theta / 2) * jnp.sin(tao / 2)
    qy = jnp.sin(theta / 2) * jnp.cos(phi + tao / 2)
    qz = jnp.sin(theta / 2) * jnp.sin(phi + tao / 2)
    return jnp.stack([qw, qx, qy, qz], axis=-1)


def convert_avec_to_a(a_vec: jax.Array) -> jax.Array:
    """(..., M) upper-triangular vector -> (..., N, N) symmetric matrix,
    M = N(N+1)/2 for N in {4, 10} (tools.py:502-521)."""
    m = a_vec.shape[-1]
    n = {10: 4, 55: 10}[m]
    iu = jnp.triu_indices(n)
    a = jnp.zeros((*a_vec.shape[:-1], n, n), a_vec.dtype)
    a = a.at[..., iu[0], iu[1]].set(a_vec)
    a = a.at[..., iu[1], iu[0]].set(a_vec)
    return a


def rotation_10d_to_matrix(x: jax.Array) -> jax.Array:
    """(..., 10) -> (..., 3, 3) (tools.py:529-538): the quaternion is the
    eigenvector of the smallest eigenvalue of the symmetric 4x4 built from
    the 10-vector (Peretroukhin et al.)."""
    a = convert_avec_to_a(x)
    _, evs = jnp.linalg.eigh(a)  # ascending
    return quat_to_matrix(evs[..., :, 0])


def rotation_geodesic_distance(m1: jax.Array, m2: jax.Array) -> jax.Array:
    """Angle of m1 m2^T in radians (tools.py:309-328)."""
    cos = (jnp.einsum("...ij,...ij->...", m1, m2) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def sample_rotations_quat(key: jax.Array, n: int) -> jax.Array:
    """Uniform-ish random rotations from gaussian quaternions
    (tools.py:341-345)."""
    return quat_to_matrix(jax.random.normal(key, (n, 4)))


def sample_rotations_hopf(key: jax.Array, n: int) -> jax.Array:
    """Hopf-coordinate sampler (tools.py:347-377)."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (n,)) * jnp.pi
    phi = jax.random.uniform(k2, (n,)) * 2.0 * jnp.pi
    tao = jax.random.uniform(k3, (n,)) * 2.0 * jnp.pi
    return quat_to_matrix(_hopf_quat(theta, phi, tao))


def sample_rotations_axis_angle(key: jax.Array, n: int, angle: float) -> jax.Array:
    """Bounded random rotations (tools.py:379-411). Replicates the
    reference's quirk of using (cos theta, sin theta * axis) — i.e. a
    half-angle convention off by 2x: `angle` in turns of pi bounds theta,
    the realised rotation angle is 2*theta."""
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(
        k1, (n,), minval=-angle / 2.0, maxval=angle / 2.0
    ) * jnp.pi
    axis = jax.random.normal(k2, (n, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True).clip(1e-8)
    quat = jnp.concatenate(
        [jnp.cos(theta)[:, None], jnp.sin(theta)[:, None] * axis], axis=-1
    )
    return quat_to_matrix(quat)
