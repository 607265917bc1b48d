"""Point-MAE-style grouping / token / transformer modules.

Rebuilds the reference's `misc/modules.py` surface (imported wholesale by
models/model.py:15, which made KNN_CUDA an import-time hard dependency even
though no class runs in the shipped forward path — SURVEY.md section 2a
"transformer modules"). Here they are a real, dependency-free extension
surface for masked-point-modeling variants.

Parity targets (reference misc/modules.py):
  * ConvBNReLU1D / ConvBNReLURes1D / PosExtraction  (:54-116)
  * PointNetFeaturePropagation                       (:118-169)
  * Token_Embed                                      (:172-220)
  * Group / Group_v2                                 (:222-283) — one
    `group_points` fn; pass `return_original=True` for the _v2 output.
  * Mlp / Attention / Block                          (:285-354)
  * Encoder_Block / Decoder_Block                    (:356-399)

TPU-first deltas: channels-last (B, N, C) layout so pointwise Conv1d
becomes an MXU Dense; FPS + grouping are `lax.scan`/gather (jit-safe, no
KNN_CUDA); the additive `mask * -1e5` attention-bias convention is kept
bit-compatible with the reference so converted weights behave identically.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvmatcher_tpu.models.layers import BatchNorm, TorchDense
from dvmatcher_tpu.ops.fps import farthest_point_sample
from dvmatcher_tpu.ops.geometry import index_points, knn_idx


# ---------------------------------------------------------------------------
# grouping (reference Group / Group_v2, misc/modules.py:222-283)


def group_points(
    xyz: jax.Array,
    num_group: int,
    group_size: int,
    *,
    start: jax.Array | int = 0,
    return_original: bool = False,
):
    """FPS `num_group` centers, gather each center's `group_size` kNN.

    xyz: (B, N, 3). Returns (neighborhood (B,G,M,3) center-relative,
    center (B,G,3), idx (B,G,M) into N); with `return_original` also the
    un-normalised neighborhood — the Group_v2 variant (modules.py:253-283).
    """
    starts = jnp.broadcast_to(jnp.asarray(start, jnp.int32), xyz.shape[:1])
    fps_idx = jax.vmap(
        lambda pts, s: farthest_point_sample(pts, num_group, start=s)
    )(xyz, starts)
    center = index_points(xyz, fps_idx)  # (B, G, 3)
    idx = knn_idx(center, xyz, group_size)  # (B, G, M)
    neighborhood_ori = index_points(xyz, idx)  # (B, G, M, 3)
    neighborhood = neighborhood_ori - center[:, :, None, :]
    if return_original:
        return neighborhood, center, idx, neighborhood_ori
    return neighborhood, center, idx


# ---------------------------------------------------------------------------
# pointwise conv stacks (reference misc/modules.py:54-116)


class ConvBNReLU1D(nn.Module):
    """Pointwise conv + BN + GELU (modules.py:54-65), channels-last."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchDense(self.features, use_bias=self.use_bias)(x)
        x = BatchNorm()(x, train)
        return nn.gelu(x)


class ConvBNReLURes1D(nn.Module):
    """Residual pointwise block act(net2(net1(x)) + x) (modules.py:68-97)."""

    features: int
    res_expansion: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.res_expansion)
        h = TorchDense(hidden, use_bias=self.use_bias)(x)
        h = BatchNorm()(h, train)
        h = nn.gelu(h)
        h = TorchDense(self.features, use_bias=self.use_bias)(h)
        h = BatchNorm()(h, train)
        return nn.gelu(h + x)


class PosExtraction(nn.Module):
    """`blocks` stacked ConvBNReLURes1D (modules.py:99-116)."""

    features: int
    blocks: int = 1
    res_expansion: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.blocks):
            x = ConvBNReLURes1D(self.features, self.res_expansion)(x, train)
        return x


class PointNetFeaturePropagation(nn.Module):
    """Upsample coarse features to a dense cloud (modules.py:118-169).

    3-NN inverse-distance interpolation of `points2` (at xyz2) onto xyz1,
    concat with `points1`, then fuse + extraction stacks. All tensors
    channels-last: xyz1 (B,N,3), xyz2 (B,S,3), points1 (B,N,D') or None,
    points2 (B,S,D'').
    """

    features: int
    blocks: int = 1
    res_expansion: float = 1.0

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False):
        s = xyz2.shape[1]
        if s == 1:
            interpolated = jnp.broadcast_to(
                points2, (points2.shape[0], xyz1.shape[1], points2.shape[-1])
            )
        else:
            # 3-NN inverse-distance weights (modules.py:144-155)
            from dvmatcher_tpu.ops.geometry import knn_with_dist

            d2, idx = knn_with_dist(xyz1, xyz2, 3, exact=True)
            recip = 1.0 / (d2 + 1e-8)
            w = recip / jnp.sum(recip, axis=-1, keepdims=True)  # (B, N, 3)
            interpolated = jnp.sum(
                index_points(points2, idx) * w[..., None], axis=2
            )
        feats = (
            interpolated
            if points1 is None
            else jnp.concatenate([points1, interpolated], axis=-1)
        )
        feats = ConvBNReLU1D(self.features)(feats, train)
        return PosExtraction(self.features, self.blocks, self.res_expansion)(
            feats, train
        )


class TokenEmbed(nn.Module):
    """Mini-PointNet per group -> token (modules.py:172-220).

    point_groups (B, G, M, C_in) -> (B, G, out_c). The reference branches
    on in_c==3 for the stage widths; both branches share the
    conv/max/concat/conv/max topology.
    """

    in_c: int
    out_c: int

    @nn.compact
    def __call__(self, pg, train: bool = False):
        b, g, m, c = pg.shape
        x = pg.reshape(b * g, m, c)
        if self.in_c == 3:
            w1, w2, wcat = 128, 256, 512
        else:
            w1, w2, wcat = self.in_c, self.in_c, self.in_c * 2
        h = TorchDense(w1)(x)
        h = BatchNorm()(h, train)
        h = nn.relu(h)
        h = TorchDense(w2)(h)  # (BG, M, w2)
        hg = jnp.max(h, axis=1, keepdims=True)  # (BG, 1, w2)
        h = jnp.concatenate([jnp.broadcast_to(hg, h.shape), h], axis=-1)
        if self.in_c == 3:
            h = TorchDense(wcat)(h)
            h = BatchNorm()(h, train)
            h = nn.relu(h)
            h = TorchDense(self.out_c)(h)
        else:
            h = TorchDense(self.out_c)(h)
            h = BatchNorm()(h, train)
            h = nn.relu(h)
            h = TorchDense(self.out_c)(h)
        return jnp.max(h, axis=1).reshape(b, g, self.out_c)


# ---------------------------------------------------------------------------
# ViT blocks with the reference's additive-mask convention
# (misc/modules.py:285-399; distinct from models/dino/vit.py, which is
# weight-layout-locked to DINOv2)


class Mlp(nn.Module):
    """fc1-GELU-fc2 (modules.py:285-301); dropout omitted (0 in every
    reference instantiation)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(TorchDense(self.hidden)(x))
        return TorchDense(self.out)(x)


class MaskedAttention(nn.Module):
    """Multi-head self-attention with the reference's `mask * -100000`
    additive bias (modules.py:304-333). mask: (B, N, N), 1 = blocked."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = TorchDense(3 * c, use_bias=self.qkv_bias)(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd**-0.5)
        if mask is not None:
            attn = attn + (mask * -100000.0)[:, None, :, :]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return TorchDense(c)(out)


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (timm semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask / keep


class Block(nn.Module):
    """Pre-norm transformer block (modules.py:335-354)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        dp = DropPath(self.drop_path)
        x = x + dp(
            MaskedAttention(self.dim, self.num_heads, self.qkv_bias)(
                nn.LayerNorm()(x), mask
            ),
            train,
        )
        x = x + dp(
            Mlp(int(self.dim * self.mlp_ratio), self.dim)(nn.LayerNorm()(x)),
            train,
        )
        return x


class EncoderBlocks(nn.Module):
    """Depth-stacked blocks; pos re-added before EVERY block, shared
    visibility mask (modules.py:356-372)."""

    dim: int = 768
    depth: int = 4
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, pos, vis_mask=None, train: bool = False):
        rates = [self.drop_path * i / max(self.depth - 1, 1) for i in range(self.depth)]
        for r in rates:
            x = Block(self.dim, self.num_heads, self.mlp_ratio, drop_path=r)(
                x + pos, vis_mask, train
            )
        return x


class DecoderBlocks(nn.Module):
    """Unmasked depth-stacked blocks, pos re-added per block
    (modules.py:374-399)."""

    dim: int = 384
    depth: int = 4
    num_heads: int = 6
    mlp_ratio: float = 4.0
    drop_path: float = 0.1

    @nn.compact
    def __call__(self, x, pos, train: bool = False):
        rates = [self.drop_path * i / max(self.depth - 1, 1) for i in range(self.depth)]
        for r in rates:
            x = Block(self.dim, self.num_heads, self.mlp_ratio, drop_path=r)(
                x + pos, None, train
            )
        return x
