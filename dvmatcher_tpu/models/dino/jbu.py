"""Joint Bilateral Upsampling stack (FeatUp-style) in flax/XLA.

Replaces the FeatUp 'dinov2' upsampler (reference train.py:72): four
learned 2x JBU stages lift 16x16 ViT features toward image resolution,
guided by the input image. Each stage computes, per hi-res pixel p over a
(2r+1)^2 window W of the lo-res grid around p/2:

    w(p, q) = exp(-||dq||^2 / 2 sigma_sp^2)
            * exp(-||k(g_p) - k(g_q)||^2 / 2 sigma_rg^2)
    hr[p]   = sum_q w(p, q) lr[q] / sum_q w(p, q)

with k a learned 1x1 projection of the guidance image and per-stage learned
sigmas — the JBU formulation of the FeatUp paper. Weight conversion from a
FeatUp checkpoint is handled by tools/convert_dinov2.py; until converted
weights are supplied the stack runs with sensible random/default init
(pipeline-complete, not feature-parity — no hub access here).

Implementation: the window sum is (2r+1)^2 shifted adds over padded
arrays — pure XLA, fuses well, no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _avg_pool_to(x: jax.Array, h: int, w: int) -> jax.Array:
    """Adaptive average pool (B, H, W, C) -> (B, h, w, C) for H % h == 0."""
    b, hh, ww, c = x.shape
    fh, fw = hh // h, ww // w
    return x.reshape(b, h, fh, w, fw, c).mean(axis=(2, 4))


class JBU(nn.Module):
    key_dim: int = 32
    radius: int = 3

    @nn.compact
    def __call__(self, lr: jax.Array, guidance: jax.Array) -> jax.Array:
        """lr (B, h, w, C), guidance (B, 2h, 2w, 3) -> (B, 2h, 2w, C)."""
        b, h, w, c = lr.shape
        hh, wwidth = 2 * h, 2 * w
        r = self.radius

        g_key = nn.Dense(self.key_dim, name="range_proj")(guidance)
        g_key_lr = _avg_pool_to(g_key, h, w)

        log_sp = self.param("log_sigma_spatial", nn.initializers.zeros, ())
        log_rg = self.param("log_sigma_range", nn.initializers.zeros, ())
        inv2sp = 0.5 * jnp.exp(-2.0 * log_sp)
        inv2rg = 0.5 * jnp.exp(-2.0 * log_rg)

        # hi-res pixel p maps to lo-res base q0 = floor(p/2); window offsets
        # dq in [-r, r]^2 around q0. Shift via padded slices.
        lr_pad = jnp.pad(lr, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
        key_pad = jnp.pad(g_key_lr, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")

        # upsample base coordinates: lo-res arrays expanded 2x by repetition
        def up2(x):
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        # fractional offset of each hi-res pixel within its lo-res cell
        fy = (jnp.arange(hh) % 2)[None, :, None, None].astype(jnp.float32) * 0.5
        fx = (jnp.arange(wwidth) % 2)[None, None, :, None].astype(jnp.float32) * 0.5

        num = jnp.zeros((b, hh, wwidth, c), lr.dtype)
        den = jnp.zeros((b, hh, wwidth, 1), lr.dtype)
        for di in range(-r, r + 1):
            for dj in range(-r, r + 1):
                lr_s = up2(lr_pad[:, r + di : r + di + h, r + dj : r + dj + w])
                key_s = up2(key_pad[:, r + di : r + di + h, r + dj : r + dj + w])
                # spatial distance in lo-res units from p's true position
                dy = di - (fy - 0.25)
                dx = dj - (fx - 0.25)
                sp = (dy * dy + dx * dx) * inv2sp
                rg = jnp.sum((g_key - key_s) ** 2, axis=-1, keepdims=True) * inv2rg
                wgt = jnp.exp(-sp - rg)
                num = num + wgt * lr_s
                den = den + wgt
        return num / (den + 1e-8)


class JBUStack(nn.Module):
    """Four 2x JBU stages: 16 -> 256, guided by pooled views of the image,
    plus a residual 'fixup' projection (FeatUp-style)."""

    stages: int = 4

    @nn.compact
    def __call__(self, feats: jax.Array, image: jax.Array) -> jax.Array:
        """feats (B, h, w, C), image (B, H, W, 3) -> (B, 2^stages*h, ..., C)."""
        x = feats
        for i in range(self.stages):
            th, tw = x.shape[1] * 2, x.shape[2] * 2
            g = jax.image.resize(
                image, (image.shape[0], th, tw, image.shape[3]), method="bilinear"
            )
            x = JBU(name=f"up_{i + 1}")(x, g)
        proj = nn.Dense(x.shape[-1], use_bias=True, name="fixup_proj")(x)
        return x + 0.1 * proj
