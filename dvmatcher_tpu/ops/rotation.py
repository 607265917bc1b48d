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
