"""Training-time augmentations (port of misc/utils.py:303-347).

Random euler rotation (per-axis degree bounds), clipped gaussian jitter,
anisotropic scaling. Keyed JAX RNG instead of global seeds; jittable so it
can live inside the train step (the reference applies it on host —
train.py:96-98, shipped configs have it commented out).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _euler_matrix(thetas: jax.Array) -> jax.Array:
    cx, sx = jnp.cos(thetas[0]), jnp.sin(thetas[0])
    cy, sy = jnp.cos(thetas[1]), jnp.sin(thetas[1])
    cz, sz = jnp.cos(thetas[2]), jnp.sin(thetas[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def data_augmentation(
    verts: jax.Array,
    key: jax.Array,
    rot_x: float = 0.0,
    rot_y: float = 90.0,
    rot_z: float = 0.0,
    std: float = 0.01,
    noise_clip: float = 0.05,
    scale_min: float = 0.9,
    scale_max: float = 1.1,
) -> jax.Array:
    """(..., N, 3) -> augmented copy (rotation + clipped jitter + scale)."""
    k_rot, k_noise, k_scale = jax.random.split(key, 3)
    bounds = jnp.array([rot_x, rot_y, rot_z]) * math.pi / 180.0
    thetas = jax.random.uniform(k_rot, (3,), minval=-1.0, maxval=1.0) * bounds
    rot = _euler_matrix(thetas)
    verts = verts @ rot.T
    noise = jnp.clip(
        std * jax.random.normal(k_noise, verts.shape), -noise_clip, noise_clip
    )
    verts = verts + noise
    scale = scale_min + jax.random.uniform(k_scale, (3,)) * (scale_max - scale_min)
    return verts * scale


def augment_batch(batch: dict, key: jax.Array, **kw) -> dict:
    """Augment both shapes of a pair batch (misc/utils.py:343-347)."""
    k1, k2 = jax.random.split(key)
    batch = dict(batch)
    for side, k in (("shape1", k1), ("shape2", k2)):
        s = dict(batch[side])
        s["xyz"] = data_augmentation(s["xyz"], k, **kw)
        batch[side] = s
    return batch


def random_halfspace_crop(
    verts: jax.Array, key: jax.Array, n_keep: int = 100
) -> jax.Array:
    """Random half-space crop indices (reference test_partial.py:146-169
    `partial_ponit`): pick one of the six axis half-spaces (shared across
    the batch, like the reference's single `random.randint`), then return
    the first `n_keep` farthest-point-ordered indices among the points
    inside it. Static shapes: the mask feeds masked FPS instead of
    boolean indexing.

    verts: (B, N, 3) -> (B, n_keep) int32 indices into N.
    """
    from dvmatcher_tpu.ops.fps import farthest_point_sample

    k_side, k_start = jax.random.split(key)
    choice = jax.random.randint(k_side, (), 0, 6)
    axis = choice % 3
    sign = jnp.where(choice < 3, 1.0, -1.0)
    coord = jnp.take(verts, axis, axis=-1)  # (B, N)
    mask = coord * sign > 0

    starts = jax.random.randint(k_start, (verts.shape[0],), 0, verts.shape[1])
    # seed FPS inside the kept half-space: replace invalid seeds with the
    # first valid index per sample
    first_valid = jnp.argmax(mask, axis=-1)
    seed_ok = jnp.take_along_axis(mask, starts[:, None], axis=-1)[:, 0]
    starts = jnp.where(seed_ok, starts, first_valid)
    return jax.vmap(
        lambda v, s, m: farthest_point_sample(v, n_keep, start=s, mask=m)
    )(verts, starts, mask)
