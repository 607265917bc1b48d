"""Visual feature lifting: point cloud -> 1152-d per-point DINO features.

Equivalent of the reference's `Uni3FC_DINO_proj.forward`
(models/model.py:952-986) + the in-forward projection path of Uni3FC
(models/model.py:683-708): three axis-permuted views -> pseudo-image
rasterisation -> frozen ViT + JBU upsampling -> per-point back-projection
-> L2 normalise -> concat (3 x 384 = 1152).

Used offline to pre-extract features (`feat_mat` mode, dataset.py:159-194)
for the full-shape config, and inline for the partial config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvmatcher_tpu.models.dino.jbu import JBUStack
from dvmatcher_tpu.models.dino.vit import DinoV2ViT
from dvmatcher_tpu.ops.rasterize import IMG_SIZE, i2p, proj2img, three_views


class ChannelNorm(nn.Module):
    """FeatUp's use_norm=True: trained LayerNorm over the channel dim."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class FeatureLifter(nn.Module):
    """Frozen 2D feature lifting; always applied under stop_gradient."""

    dim: int = 384
    vit_depth: int = 12
    jbu_stages: int = 4

    @nn.compact
    def __call__(self, pc: jax.Array) -> jax.Array:
        """pc (B, N, 3) -> (B, N, 3*dim) lifted features."""
        views = three_views(pc)
        imgs, metas = [], []
        for v in views:
            img, pc_min, grid, offs = proj2img(v)
            imgs.append(img)
            metas.append((pc_min, grid, offs))

        batch = jnp.concatenate(imgs, axis=0)  # (3B, H, W, 3)
        tokens = DinoV2ViT(dim=self.dim, depth=self.vit_depth, name="vit")(
            batch
        )  # (3B, 16, 16, C)
        tokens = ChannelNorm(name="channel_norm")(tokens)
        hr = JBUStack(stages=self.jbu_stages, name="jbu")(tokens, batch)
        hr = jax.image.resize(
            hr,
            (hr.shape[0], IMG_SIZE, IMG_SIZE, hr.shape[-1]),
            method="cubic",
        )  # I2P's bicubic resize to img_size (models/model.py:668)

        b = pc.shape[0]
        feats = []
        for i, (v, (pc_min, grid, offs)) in enumerate(zip(views, metas)):
            f = hr[i * b : (i + 1) * b]
            pts_feat = i2p(v, f, pc_min, grid, offs)  # (B, N, C)
            pts_feat = pts_feat / jnp.linalg.norm(
                pts_feat, axis=-1, keepdims=True
            ).clip(1e-12)
            feats.append(pts_feat)
        out = jnp.concatenate(feats, axis=-1)  # (B, N, 3C)
        return jax.lax.stop_gradient(out)
