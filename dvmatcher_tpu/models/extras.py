"""Auxiliary point-cloud blocks carried on the reference's API surface.

Rebuilds of the defined-but-unshipped modules in models/model.py —
attention-driven down/upsampling (:125-198), EdgeConv-style Embedding
(:200-253), global P2PAttention (:397-431), and the cross_transformer
(:763-813) — kept because they define the framework's extension surface
for DPC-style cross-reconstruction variants. Channels-last layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvmatcher_tpu.models.layers import BatchNorm, TorchDense
from dvmatcher_tpu.ops.geometry import index_points, knn_idx


def _group_diff(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """kNN in feature space -> (neighbors-minus-center (B,N,K,C), idx)."""
    idx = knn_idx(x, x, k)
    nbrs = index_points(x, idx)
    return nbrs - x[:, :, None, :], idx


class GlobalDownSample(nn.Module):
    """Attention-scored point selection (models/model.py:125-146)."""

    npts_ds: int

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        c = x.shape[-1]
        q = TorchDense(c, use_bias=False)(x)
        k = TorchDense(c, use_bias=False)(x)
        v = TorchDense(c, use_bias=False)(x)
        energy = jnp.einsum("bnc,bmc->bnm", q, k) / math.sqrt(c)
        attn = jax.nn.softmax(energy, axis=-1)
        selection = jnp.sum(attn, axis=-2)  # (B, N) column mass
        _, idx = jax.lax.top_k(selection, self.npts_ds)  # (B, M)
        scores = jnp.take_along_axis(attn, idx[:, :, None], axis=1)  # (B, M, N)
        return jnp.einsum("bmn,bnc->bmc", scores, v), idx


class LocalDownSample(nn.Module):
    """Neighborhood-attention-variance selection (models/model.py:149-176)."""

    npts_ds: int
    k: int = 32

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        c = x.shape[-1]
        diff, _ = _group_diff(x, self.k)
        q = TorchDense(c, use_bias=False)(x)[:, :, None, :]  # (B, N, 1, C)
        kk = TorchDense(c, use_bias=False)(diff)  # (B, N, K, C)
        v = TorchDense(c, use_bias=False)(diff)
        energy = jnp.einsum("bnoc,bnkc->bnok", q, kk) / math.sqrt(c)
        attn = jax.nn.softmax(energy, axis=-1)  # (B, N, 1, K)
        selection = jnp.std(attn[:, :, 0, :], axis=-1)  # (B, N)
        _, idx = jax.lax.top_k(selection, self.npts_ds)
        scores = jnp.take_along_axis(attn, idx[:, :, None, None], axis=1)
        v_sel = jnp.take_along_axis(v, idx[:, :, None, None], axis=1)
        return jnp.einsum("bmok,bmkc->bmc", scores, v_sel), idx


class UpSample(nn.Module):
    """Cross-attention upsampling with skip link (models/model.py:179-198)."""

    @nn.compact
    def __call__(self, pcd_up, pcd_down):  # (B, N, C), (B, M, C)
        c = pcd_up.shape[-1]
        q = TorchDense(c, use_bias=False)(pcd_up)
        k = TorchDense(c, use_bias=False)(pcd_down)
        v = TorchDense(c, use_bias=False)(pcd_down)
        energy = jnp.einsum("bnc,bmc->bnm", q, k) / math.sqrt(c)
        attn = jax.nn.softmax(energy, axis=-1)
        x = jnp.einsum("bnm,bmc->bnc", attn, v)
        return TorchDense(c, use_bias=False)(pcd_up) + x


class ConvBN2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchDense(self.features, use_bias=False)(x)
        x = BatchNorm()(x, train)
        return nn.leaky_relu(x, 0.2)


class Embedding(nn.Module):
    """Two-stage EdgeConv embedding + positional encoding
    (models/model.py:200-253)."""

    k: int = 32

    @nn.compact
    def __call__(self, xyz, train: bool = False):  # (B, N, 3)
        from dvmatcher_tpu.models.backbone import pos_encoding_sin_wave

        pos = pos_encoding_sin_wave(xyz)  # (B, N, 384)

        def center_diff(x):
            diff, _ = _group_diff(x, self.k)
            center = jnp.broadcast_to(x[:, :, None, :], diff.shape)
            return jnp.concatenate([center, diff], axis=-1)

        x = center_diff(xyz)  # (B, N, K, 6)
        x = ConvBN2d(128)(x, train)
        x = ConvBN2d(64)(x, train)
        x1 = jnp.max(x, axis=2)
        x = center_diff(x1)  # (B, N, K, 128)
        x = ConvBN2d(128)(x, train)
        x = ConvBN2d(64)(x, train)
        x2 = jnp.max(x, axis=2)
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBN2d(384)(x, train)
        x = x + pos
        return ConvBN2d(64)(x, train)


class CrossTransformer(nn.Module):
    """Cross-attention block (models/model.py:763-813): standard MHA of
    src queries over tgt keys/values + FFN, pre-projected inputs."""

    d_model: int = 256
    d_out: int = 256
    heads: int = 4
    d_ff: int = 1024

    @nn.compact
    def __call__(self, src, tgt):  # (B, N, C), (B, M, C)
        src = TorchDense(self.d_out)(src)
        tgt = TorchDense(self.d_out)(tgt)
        h, d = self.heads, self.d_out // self.heads
        b, n, _ = src.shape
        m = tgt.shape[1]
        q = TorchDense(self.d_out)(src).reshape(b, n, h, d)
        k = TorchDense(self.d_out)(tgt).reshape(b, m, h, d)
        v = TorchDense(self.d_out)(tgt).reshape(b, m, h, d)
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d), axis=-1
        )
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.d_out)
        x = nn.LayerNorm()(src + out)
        ff = TorchDense(self.d_ff)(x)
        ff = nn.gelu(ff)
        ff = TorchDense(self.d_out)(ff)
        return nn.LayerNorm()(x + ff)
