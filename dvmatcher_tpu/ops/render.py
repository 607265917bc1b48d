"""Multi-view point depth rendering (misc/render_point_cloud.py rebuild).

The reference wraps pytorch3d's PointsRasterizer to render batched depth
maps from multiple camera elevations/azimuths (`batch_render` :91), used
only by a commented-out semantic variant. Rebuilt as a z-buffer point
splat: orthographic/simple-perspective project, scatter per-pixel MINIMUM
depth via a segment-min — pure XLA, no rasteriser dependency.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import BIG


def _look_at(elev: float, azim: float, dist: float) -> jax.Array:
    """World->camera rotation for a camera at (dist, elev, azim), looking
    at the origin, y-up."""
    e, a = math.radians(elev), math.radians(azim)
    eye = jnp.array(
        [dist * math.cos(e) * math.sin(a), dist * math.sin(e), dist * math.cos(e) * math.cos(a)]
    )
    z = -eye / jnp.linalg.norm(eye)
    up = jnp.array([0.0, 1.0, 0.0])
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z]), eye


def render_depth(
    pc: jax.Array, elev: float, azim: float, dist: float = 2.0, img_size: int = 224
) -> jax.Array:
    """(B, N, 3) -> (B, H, W) depth image (BIG where empty)."""
    rot, eye = _look_at(elev, azim, dist)
    cam = (pc - eye) @ rot.T  # (B, N, 3) camera coords, +z forward
    z = cam[..., 2]
    # simple perspective
    uv = cam[..., :2] / z[..., None].clip(1e-6)
    px = jnp.clip(((uv + 1.0) * 0.5 * (img_size - 1)), 0, img_size - 1)
    flat = (jnp.floor(px[..., 1]) * img_size + jnp.floor(px[..., 0])).astype(jnp.int32)

    def zbuf(zb, idx):
        return jax.ops.segment_min(zb, idx, num_segments=img_size * img_size)

    depth = jax.vmap(zbuf)(z, flat)
    depth = jnp.where(jnp.isfinite(depth), depth, BIG)
    return depth.reshape(pc.shape[0], img_size, img_size)


def batch_render(
    pc: jax.Array,
    elevations=(0.0, 30.0),
    azimuths=(0.0, 90.0, 180.0, 270.0),
    dist: float = 2.0,
    img_size: int = 224,
) -> jax.Array:
    """(B, N, 3) -> (B, V, H, W) multi-view depth maps."""
    views = [
        render_depth(pc, e, a, dist, img_size)
        for e in elevations
        for a in azimuths
    ]
    return jnp.stack(views, axis=1)
