"""Uni3FC (LG-Net) point-feature backbone.

TPU-native rebuild of reference models/model.py:480-761: per-point 128-d
descriptor field from xyz + (optionally) 1152-d lifted 2D visual features.

Pipeline (forward, models/model.py:680-761):
  1. lifted visual features (B,N,1152) -> ConvBN 384   [`conv`]
  2. + NeRF-style sin/cos positional encoding (D=64 -> 384)
  3. ConvBN 64                                          [`conv0`] -> `cfeats`
  4. two parallel towers x4 blocks: local N2PAttention(k) || global SALayer
  5. concat 4x64 per tower -> ConvBN 512 [`conv1`/`conv2`] -> global maxpool
     -> broadcast -> concat with the 4 block outputs -> ConvBN 128
     [`conv3`/`conv4`]
  6. fuse: concat(local, global) 256 -> ConvBN 128 [`conv5`] -> 3x
     N2PAttention(128) -> concat 512 -> ConvBN 128 [`conv6`]

When the visual features are absent (the reference's `with_dino=False`
partial config), `feats` may be None and the backbone runs on positional
encoding alone, matching the reference where `clip_feats + pos` degenerates
because the projection branch is skipped only when features are precomputed
— we instead expose the explicit `use_feats=False` mode where the 1152->384
projection is skipped and only `pos` feeds conv0.

Mask-aware throughout for padded clouds (TPU static shapes); the reference
instead recompiles per mesh size.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvmatcher_tpu.models.layers import ConvBN, N2PAttention, SALayer, BIG


def pos_encoding_sin_wave(
    xyz: jax.Array,
    mask: jax.Array | None = None,
    d: int = 64,
    shard_axis: str | None = None,
):
    """(B, N, 3) -> (B, N, 6*d). Reference models/model.py:544-561.

    Coordinates are normalised to [-1, 1] by the *global* min/max over the
    whole batch tensor (a scalar — reference uses coor.min()/coor.max()).
    Frequencies are pi * 2^i, i in [0, d). With `shard_axis` (point axis
    sharded under shard_map) the min/max reduce across devices too.
    """
    if mask is None:
        lo = jnp.min(xyz)
        hi = jnp.max(xyz)
    else:
        m = mask[..., None]
        lo = jnp.min(jnp.where(m, xyz, BIG))
        hi = jnp.max(jnp.where(m, xyz, -BIG))
    if shard_axis is not None:
        # shard_axis may be one mesh axis name or a tuple (e.g. the point
        # axis plus a sharded batch axis on a 2-D dp x sp mesh): the
        # reference normalises by the min/max of the WHOLE batch tensor,
        # so the reduction must span every sharded axis.
        lo = jax.lax.pmin(lo, shard_axis)
        hi = jax.lax.pmax(hi, shard_axis)
    normal = 2.0 * (xyz - lo) / (hi - lo) - 1.0
    freqs = math.pi * (2.0 ** jnp.arange(d, dtype=jnp.float32))
    k = normal[..., None] * freqs  # (B, N, 3, d)
    enc = jnp.concatenate([jnp.sin(k), jnp.cos(k)], axis=-1)  # (B, N, 3, 2d)
    b, n = xyz.shape[:2]
    return enc.reshape(b, n, 3 * 2 * d)


class Uni3FC(nn.Module):
    k: int = 40
    emb_dims: int = 512
    out: int = 128
    feat_dim: int = 1152
    # Fused Pallas kNN attention (inference path; parameters are identical,
    # so one set of weights serves both impls — flip the flag at apply time
    # by constructing a second module instance).
    use_kernel: bool = False
    # Compute dtype for the dense conv/FFN matmuls (flax mixed precision:
    # params stay f32). jnp.bfloat16 = single-pass MXU matmuls; outputs are
    # cast back to f32 so descriptors/search are unchanged downstream.
    dtype: jnp.dtype | None = None
    # Point-axis (sequence-parallel) sharding: mesh axis name the N
    # dimension is sharded over (masks shard along with the points).
    # Inference-only (train=False); must run inside shard_map — use
    # parallel.sharded_backbone. The reference's scale ceiling is the
    # single-GPU N x N materialisation (SURVEY.md section 2c); this is
    # the multi-chip extension.
    shard_axis: str | None = None
    # Optional extra mesh axis the BATCH dimension is sharded over (2-D
    # dp x sp meshes). Only the global pos-encoding min/max needs to know
    # — every other op is batch-elementwise or reduces over points only.
    batch_shard_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        feats: jax.Array | None,
        train: bool = False,
        mask: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """xyz (B,N,3), feats (B,N,1152) lifted visual features or None.

        Returns (descriptors (B,N,out), cfeats (B,N,64))."""
        if self.shard_axis is not None:
            assert not train, (
                "point-axis sharded backbone is inference-only "
                "(BatchNorm running stats)"
            )
        pos_axes = self.shard_axis
        if pos_axes is not None and self.batch_shard_axis is not None:
            pos_axes = (self.batch_shard_axis, pos_axes)
        pos = pos_encoding_sin_wave(xyz, mask, shard_axis=pos_axes)
        if self.dtype is not None:
            pos = pos.astype(self.dtype)
        if feats is not None:
            f = ConvBN(384, dtype=self.dtype)(feats, train)
            f = f + pos
        else:
            f = pos
        tmp = ConvBN(64, dtype=self.dtype)(f, train)  # conv0 -> cfeats

        xs, gs = [], []
        x, g = tmp, tmp
        for i in range(4):
            x = N2PAttention(
                64, self.k, use_kernel=self.use_kernel, dtype=self.dtype,
                shard_axis=self.shard_axis, name=f"n2p_{i + 1}",
            )(x, train, mask)
            g = SALayer(
                64, use_kernel=self.use_kernel, dtype=self.dtype,
                shard_axis=self.shard_axis, name=f"sa_{i + 1}",
            )(g, train, mask)
            xs.append(x)
            gs.append(g)

        cat_x = jnp.concatenate(xs, axis=-1)  # (B, N, 256)
        cat_g = jnp.concatenate(gs, axis=-1)

        e_x = ConvBN(self.emb_dims, dtype=self.dtype, name="conv1")(cat_x, train)
        e_g = ConvBN(self.emb_dims, dtype=self.dtype, name="conv2")(cat_g, train)

        def masked_max(v):
            if mask is not None:
                v = jnp.where(mask[..., None], v, -BIG)
            v = jnp.max(v, axis=1, keepdims=True)
            if self.shard_axis is not None:
                # all_gather + max instead of pmax: identical forward, but
                # differentiable (pmax has no transpose rule), so gradients
                # flow through the sharded graph for fine-tuning at scale
                v = jnp.max(
                    jax.lax.all_gather(
                        v, self.shard_axis, axis=1, tiled=True
                    ),
                    axis=1,
                    keepdims=True,
                )
            return v

        gmax_x = jnp.broadcast_to(masked_max(e_x), e_x.shape)
        gmax_g = jnp.broadcast_to(masked_max(e_g), e_g.shape)

        y_x = ConvBN(128, dtype=self.dtype, name="conv3")(
            jnp.concatenate([gmax_x, cat_x], axis=-1), train
        )
        y_g = ConvBN(128, dtype=self.dtype, name="conv4")(
            jnp.concatenate([gmax_g, cat_g], axis=-1), train
        )

        x1 = ConvBN(128, dtype=self.dtype, name="conv5")(
            jnp.concatenate([y_x, y_g], axis=-1), train
        )
        x2 = N2PAttention(128, self.k, use_kernel=self.use_kernel, dtype=self.dtype,
            shard_axis=self.shard_axis, name="n2p_5")(
            x1, train, mask
        )
        x3 = N2PAttention(128, self.k, use_kernel=self.use_kernel, dtype=self.dtype,
            shard_axis=self.shard_axis, name="n2p_6")(
            x2, train, mask
        )
        x4 = N2PAttention(128, self.k, use_kernel=self.use_kernel, dtype=self.dtype,
            shard_axis=self.shard_axis, name="n2p_7")(
            x3, train, mask
        )

        fused = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 512)
        desc = ConvBN(self.out, dtype=self.dtype, name="conv6")(fused, train)
        # descriptors and cfeats leave in f32 regardless of compute dtype:
        # downstream NN search / losses are precision-sensitive
        return desc.astype(jnp.float32), tmp.astype(jnp.float32)
