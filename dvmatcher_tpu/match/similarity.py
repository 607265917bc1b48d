"""Similarity measures, P-normalisation, and top-k neighbor machinery.

Ports of misc/switch_functions.py:121-174 (`measure_similarity`,
`normalize_P`) and misc/correspondence_utils.py (`get_s_t_topk`,
`get_s_t_neighbors`) — the DPC-style cross-reconstruction utilities the
reference keeps on its API surface (imported by train.py:18-19).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import cdist


def measure_similarity(kind: str, a: jax.Array, b: jax.Array) -> jax.Array:
    """(B, N, F) x (B, M, F) -> (B, N, M) similarity matrix."""
    hi = jax.lax.Precision.HIGHEST
    if kind == "cosine":
        an = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-12)
        bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-12)
        return jnp.matmul(an, jnp.swapaxes(bn, -1, -2), precision=hi)
    if kind in ("mult", "multiplication"):
        return jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision=hi)
    if kind == "l2":
        d = cdist(a, b)
        return jnp.max(d) - d
    if kind == "negative_l2":
        return -cdist(a, b)
    if kind == "difference_exp":
        return jnp.exp(-cdist(a, b) * 2 * a.shape[-1])
    if kind == "difference_inverse":
        return 1.0 / (cdist(a, b) + 1e-6)
    if kind == "difference_max_norm":
        d = cdist(a, b)
        return (jnp.max(d) - d) / jnp.max(d)
    raise NameError(kind)


def normalize_p(p: jax.Array, kind: str, axis: int | None = None) -> jax.Array:
    if axis is None:
        axis = 1 if p.ndim == 3 else 0
    if kind == "no_normalize":
        return p
    if kind == "l1":
        return p / jnp.sum(jnp.abs(p), axis=axis, keepdims=True).clip(1e-12)
    if kind == "l2":
        return p / jnp.linalg.norm(p, axis=axis, keepdims=True).clip(1e-12)
    if kind == "softmax":
        return jax.nn.softmax(p, axis=axis)
    raise NameError(kind)


def get_s_t_topk(p: jax.Array, k: int, s_only: bool = False):
    """Top-k per row (source side) and per column (target side) of a
    (B, Ns, Nt) similarity matrix."""
    s_val, s_idx = jax.lax.top_k(p, min(k, p.shape[2]))
    if s_only:
        return s_val, s_idx, None, None
    t_val, t_idx = jax.lax.top_k(jnp.swapaxes(p, -1, -2), k)
    return s_val, s_idx, t_val, t_idx


def get_s_t_neighbors(
    k: int,
    p: jax.Array,
    sim_normalization: str,
    s_only: bool = False,
    ignore_first: bool = False,
):
    s_sim, s_idx, t_sim, t_idx = get_s_t_topk(p, k, s_only=s_only)
    if ignore_first:
        s_sim, s_idx = s_sim[:, :, 1:], s_idx[:, :, 1:]
    s_weight = normalize_p(s_sim, sim_normalization, axis=2)
    t_weight = None
    if not s_only:
        if ignore_first:
            t_sim, t_idx = t_sim[:, :, 1:], t_idx[:, :, 1:]
        t_weight = normalize_p(t_sim, sim_normalization, axis=2)
    return s_weight, s_sim, s_idx, t_weight, t_sim, t_idx
