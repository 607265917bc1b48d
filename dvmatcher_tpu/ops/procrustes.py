"""Rigid alignment: Kabsch (Procrustes) and ICP.

TPU-native replacements for pytorch3d's `corresponding_points_alignment`
and `iterative_closest_point` (on the reference's loss import surface,
models/loss.py:17-18,60-69): batched 3x3 SVD via jnp.linalg.svd and a
fixed-iteration ICP loop in `lax.fori_loop` (static trip count — XLA has
no data-dependent convergence break; the tolerance instead freezes
updates once converged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import sq_dist, masked_argmin, index_points


def kabsch(
    src: jax.Array,  # (..., N, 3)
    tgt: jax.Array,  # (..., N, 3)
    weights: jax.Array | None = None,  # (..., N)
    estimate_scale: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Least-squares similarity transform: returns (R, t, s) with
    src @ R * s + t ~= tgt (the corresponding_points_alignment convention:
    row-vector points, R applied on the right)."""
    if weights is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = weights
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    mu_s = jnp.einsum("...n,...nc->...c", w, src)
    mu_t = jnp.einsum("...n,...nc->...c", w, tgt)
    xs = src - mu_s[..., None, :]
    xt = tgt - mu_t[..., None, :]

    cov = jnp.einsum("...ni,...n,...nj->...ij", xs, w, xt)  # (..., 3, 3)
    u, s, vt = jnp.linalg.svd(cov)
    # proper rotation: flip the smallest singular direction if det < 0
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    flip = jnp.ones_like(s).at[..., -1].set(jnp.sign(det))
    r = jnp.einsum("...ij,...j,...jk->...ik", u, flip, vt)

    if estimate_scale:
        var_s = jnp.einsum("...n,...nc,...nc->...", w, xs, xs)
        scale = jnp.sum(s * flip, axis=-1) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.ones(src.shape[:-2], src.dtype)

    t = mu_t - scale[..., None] * jnp.einsum("...c,...ck->...k", mu_s, r)
    return r, t, scale


def icp(
    src: jax.Array,  # (B, N, 3)
    tgt: jax.Array,  # (B, M, 3)
    iters: int = 20,
    mask_tgt: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Point-to-point ICP. Returns (aligned_src, R, t, rmse)."""

    def body(_, carry):
        cur, r_acc, t_acc = carry
        d = sq_dist(cur, tgt)
        _, idx = masked_argmin(d, mask_tgt)
        matched = index_points(tgt, idx)
        r, t, _ = kabsch(cur, matched)
        new = jnp.einsum("bnc,bck->bnk", cur, r) + t[:, None, :]
        return new, jnp.einsum("bij,bjk->bik", r_acc, r), (
            jnp.einsum("bc,bck->bk", t_acc, r) + t
        )

    b = src.shape[0]
    eye = jnp.tile(jnp.eye(3, dtype=src.dtype), (b, 1, 1))
    zero = jnp.zeros((b, 3), src.dtype)
    aligned, r, t = jax.lax.fori_loop(0, iters, body, (src, eye, zero))
    d = sq_dist(aligned, tgt)
    nn, _ = masked_argmin(d, mask_tgt)
    rmse = jnp.sqrt(jnp.mean(nn, axis=-1))
    return aligned, r, t, rmse
