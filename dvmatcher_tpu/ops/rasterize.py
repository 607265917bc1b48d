"""Point-cloud -> pseudo-image projection and back-projection.

TPU-native rebuild of the reference's `proj2img` / `I2P`
(models/model.py:584-678, duplicated at :830-913 and models/loss.py:1149-1214):

proj2img: quantise the cloud's xy onto a 224x224 grid (3-px margin),
densify each point with a 5x5 tap stencil, recentre to the image middle,
scatter-sum the z values into pixels (torch_scatter.scatter -> XLA
segment_sum here), then sigmoid -> per-image min/max normalise -> PiYG
depth colormap, with empty pixels set to -1.

I2P: gather per-point features from the (upsampled) feature image at each
point's pixel (models/model.py:653-678).

The PiYG LUT ships as a 256x3 asset (matplotlib's colormap table); lookup
matches matplotlib's Colormap.__call__ quantisation.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

IMG_SIZE = 224

# 5x5 densification stencil (models/model.py:487-491)
_OFFSETS = np.array(
    [[i, j] for i in range(-2, 3) for j in range(-2, 3)], np.float32
)

_IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)

_LUT_PATH = Path(__file__).resolve().parent.parent / "assets" / "piyg_lut.npy"
_PIYG_LUT = np.load(_LUT_PATH)


def piyg_colormap(v: jax.Array) -> jax.Array:
    """Map values in [0,1] through the PiYG LUT (matplotlib quantisation:
    index = clip(floor(v * 256), 0, 255))."""
    idx = jnp.clip(jnp.floor(v * 256.0).astype(jnp.int32), 0, 255)
    return jnp.asarray(_PIYG_LUT)[idx]


def _grid_params(pc: jax.Array, img_size: int):
    """Grid size + xy min (models/model.py:587-593)."""
    pc_range = jnp.max(pc, axis=1) - jnp.min(pc, axis=1)  # (B, 3)
    grid_size = jnp.max(pc_range[:, :2], axis=-1) / (img_size - 3)  # (B,)
    pc_min = jnp.min(pc, axis=1)[:, :2][:, None, :]  # (B, 1, 2)
    return pc_min, grid_size[:, None, None]


def proj2img(
    pc: jax.Array, img_size: int = IMG_SIZE
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(B, N, 3) -> colormapped depth image (B, H, W, 3) in [-1, ~2.6].

    Returns (img, pc_min, grid_size, offsets_xy) — the latter three feed
    I2P back-projection. Follows models/model.py:584-650 exactly, including
    the single-step boundary clamp and the empty-pixel -1 sentinel.
    """
    b, n, _ = pc.shape
    pc_min, grid_size = _grid_params(pc, img_size)
    idx_xy = jnp.floor((pc[:, :, :2] - pc_min) / grid_size)  # (B, N, 2)

    dense = (
        idx_xy[:, :, None, :] + jnp.asarray(_OFFSETS)[None, None]
    ).reshape(b, n * 25, 2) + 1.0

    center = jnp.floor(
        (jnp.max(dense, axis=1) + jnp.min(dense, axis=1)) / 2.0
    ).astype(jnp.int32)  # (B, 2)
    offset_xy = (img_size / 2 - center.astype(jnp.float32) - 1.0)  # (B, 2)
    dense = dense + offset_xy[:, None, :]

    # single-step clamp (model.py:615-618)
    dense = dense + (dense < 0).astype(jnp.float32)
    dense = dense - (dense > img_size - 1).astype(jnp.float32)

    flat_idx = (dense[:, :, 0] * img_size + dense[:, :, 1]).astype(jnp.int32)
    z = jnp.repeat(pc[:, :, 2:3], 25, axis=1)  # (B, 25N, 1) z per tap

    def scatter_one(vals, idx):
        return jax.ops.segment_sum(
            vals[:, 0], idx, num_segments=img_size * img_size
        )

    acc = jax.vmap(scatter_one)(z, flat_idx)  # (B, H*W)
    img1 = acc.reshape(b, img_size, img_size)

    zero_mask = img1 == 0.0  # empty pixels (pre-sigmoid, channel-shared)
    sig = jax.nn.sigmoid(img1)
    # (sigmoid - mean)/std on channel 0 (model.py:642-646)
    d = (sig - _IMG_MEAN[0]) / _IMG_STD[0]
    # per-image min/max normalisation then PiYG (get_colored_depth_maps)
    dmin = jnp.min(d, axis=(1, 2), keepdims=True)
    dmax = jnp.max(d, axis=(1, 2), keepdims=True)
    d01 = (d - dmin) / (dmax - dmin)
    rgb = piyg_colormap(d01)  # (B, H, W, 3)
    rgb = jnp.where(zero_mask[..., None], -1.0, rgb)
    return rgb, pc_min, grid_size, offset_xy


def i2p(
    pc: jax.Array,
    feat: jax.Array,
    pc_min: jax.Array,
    grid_size: jax.Array,
    offset_xy: jax.Array,
    img_size: int = IMG_SIZE,
) -> jax.Array:
    """Back-project per-pixel features to points (models/model.py:653-678).

    pc (B, N, 3), feat (B, H, W, C) already at img_size resolution.
    Returns (B, N, C)."""
    idx_xy = jnp.floor((pc[:, :, :2] - pc_min) / grid_size) + 1.0
    idx_xy = idx_xy + offset_xy[:, None, :]
    flat_idx = (idx_xy[:, :, 0] * img_size + idx_xy[:, :, 1]).astype(jnp.int32)
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(flat, flat_idx)


def three_views(pc: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The three axis-permuted views (models/model.py:684-686): rotate -90
    degrees about z, then cyclic channel permutations."""
    from dvmatcher_tpu.ops.rotation import rotate_z
    import math

    pts1 = rotate_z(pc, -math.pi / 2)
    pts2 = jnp.concatenate([pts1[..., 2:3], pts1[..., 0:2]], axis=-1)
    pts3 = jnp.concatenate([pts1[..., 1:3], pts1[..., 0:1]], axis=-1)
    return pts1, pts2, pts3
