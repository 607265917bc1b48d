"""Functional-map training losses (DQFM-style).

Port of the reference's legacy `DQFMLoss` (misc/utils.py:65-229, still on
the import surface of test.py:6): orthogonality ||C C^T - I||, bijectivity
||C12 C21 - I||, residual ||C - C_new||, plus the same sampled
distance-profile term as the main loss (N=2000 anchors, k=1000 neighbors,
halved weight). Pure function over functional maps + descriptor fields.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dvmatcher_tpu.losses.graph_deform import dist_profile_loss


def _frob(a, b):
    """FrobeniusLoss (misc/utils.py:56-62)."""
    return jnp.mean(jnp.sum(jnp.abs(a - b) ** 2, axis=(1, 2)))


@dataclasses.dataclass(frozen=True)
class FmapLossConfig:
    w_ortho: float = 1.0
    w_bij: float = 1.0
    w_res: float = 1.0
    w_dist: float = 1.0
    n_dist: int = 2000
    k_dist: int = 1000


def dqfm_loss(
    c12: jax.Array,  # (B, K, K) functional maps
    c21: jax.Array,
    c12_new: jax.Array,
    c21_new: jax.Array,
    feat1: jax.Array | None = None,
    feat2: jax.Array | None = None,
    dist1: jax.Array | None = None,
    dist2: jax.Array | None = None,
    key: jax.Array | None = None,
    cfg: FmapLossConfig = FmapLossConfig(),
):
    """Returns (loss, aux) matching the reference's return tuple fields."""
    eye = jnp.eye(c12.shape[1])[None]
    loss = jnp.zeros(())
    aux = {}

    d_loss = jnp.zeros(())
    if cfg.w_dist > 0 and feat1 is not None and dist1 is not None:
        k1, k2 = jax.random.split(key)
        n1, n2 = feat1.shape[1], feat2.shape[1]
        a1 = jax.random.permutation(k1, n1)[: cfg.n_dist]
        a2 = jax.random.permutation(k2, n2)[: cfg.n_dist]
        d_loss = (
            dist_profile_loss(feat1, dist1, a1, cfg.k_dist)
            + dist_profile_loss(feat2, dist2, a2, cfg.k_dist)
        ) * cfg.w_dist / 2.0
        loss += d_loss
    aux["dist_loss"] = d_loss

    def t(x):
        return jnp.swapaxes(x, -1, -2)

    ortho = jnp.zeros(())
    if cfg.w_ortho > 0:
        ortho = (
            _frob(c12 @ t(c12), eye)
            + _frob(c21 @ t(c21), eye)
            + _frob(c12_new @ t(c12_new), eye)
            + _frob(c21_new @ t(c21_new), eye)
        ) * cfg.w_ortho / 2.0
        loss += ortho
    aux["ortho_loss"] = ortho

    bij = jnp.zeros(())
    if cfg.w_bij > 0:
        bij = (
            _frob(c12 @ c21, eye) + _frob(c21 @ c12, eye)
        ) * cfg.w_bij
        loss += bij
    aux["bij_loss"] = bij

    res = jnp.zeros(())
    if cfg.w_res > 0:
        res = (_frob(c12, c12_new) + _frob(c21, c21_new)) * cfg.w_res
        loss += res
    aux["res_loss"] = res

    return loss, aux
