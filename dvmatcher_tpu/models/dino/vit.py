"""DINOv2 ViT-S/14 in flax — the frozen 2D feature extractor.

Replaces the reference's torch.hub FeatUp-DINOv2 backbone
(train.py:72, models/model.py:691-693). Architecture per the public
DINOv2 release (ViT-S/14: patch 14, dim 384, depth 12, heads 6, MLP x4,
LayerScale, LN eps 1e-6). Weights come from `tools/convert_dinov2.py`
(torch state_dict -> flax params); random init otherwise (pipeline-complete
but not feature-parity until converted weights are supplied — this
environment has no model hub access).

Runs under stop_gradient in all pipelines (the reference keeps the ViT
frozen under no_grad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, d), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(jnp.float32(d))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, use_bias=True, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init, jnp.float32), (self.dim,)
        )
        return x * gamma


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(self.dim, self.heads, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + LayerScale(self.dim, name="ls2")(y)


class DinoV2ViT(nn.Module):
    patch_size: int = 14
    dim: int = 384
    depth: int = 12
    heads: int = 6
    pretrain_grid: int = 37  # DINOv2 pretrained at 518 -> 37x37 pos grid

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        """img (B, H, W, 3) -> patch tokens (B, H/14, W/14, dim)."""
        b, hh, ww, _ = img.shape
        gh, gw = hh // self.patch_size, ww // self.patch_size
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embed",
        )(img)  # (B, gh, gw, dim)
        x = x.reshape(b, gh * gw, self.dim)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.pretrain_grid * self.pretrain_grid + 1, self.dim),
        )
        pos_patch = _interp_pos(pos[:, 1:], self.pretrain_grid, gh, gw)
        x = x + pos_patch
        cls_tok = cls + pos[:, :1]
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, self.dim)), x], 1)

        for i in range(self.depth):
            x = Block(self.dim, self.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 1:].reshape(b, gh, gw, self.dim)


def _bicubic_weights(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) separable resize matrix reproducing torch
    F.interpolate(mode="bicubic", align_corners=False): cubic convolution
    kernel with A=-0.75, half-pixel centers, edge-clamped taps, and NO
    antialiasing (torch never low-pass-filters, even when downscaling —
    jax.image.resize does, and its "cubic" is Catmull-Rom A=-0.5, hence a
    custom matrix). Computed host-side: sizes are static under jit."""
    import numpy as np

    a = -0.75

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )

    scale = n_in / n_out
    w = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        x_in = (o + 0.5) * scale - 0.5
        base = int(np.floor(x_in))
        t = x_in - base
        for tap, wt in zip(range(base - 1, base + 3), k(np.arange(-1, 3) - t)):
            w[o, min(max(tap, 0), n_in - 1)] += wt
    return jnp.asarray(w)


def _interp_pos(pos: jax.Array, grid: int, gh: int, gw: int) -> jax.Array:
    """Bicubic-interpolate patch position embeddings to the target grid
    (DINOv2 interpolate_pos_encoding) — torch-bicubic-exact semantics."""
    if gh == grid and gw == grid:
        return pos
    dim = pos.shape[-1]
    p = pos.reshape(grid, grid, dim)
    wh = _bicubic_weights(grid, gh)
    ww = _bicubic_weights(grid, gw)
    p = jnp.einsum("oi,ijd,pj->opd", wh, p, ww)
    return p.reshape(1, gh * gw, dim)
