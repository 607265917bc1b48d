"""Soft correspondence maps Π = softmax(-α·cdist) with top-k sparsification.

Parity targets in the reference:
  * `knnsearch_t_grad` models/loss.py:110-114 — Π rows are a temperature
    softmax over euclidean feature distances (α annealed 10→100 over
    training, train.py:75,90).
  * `topk_pi` models/loss.py:1339-1347 — keep the top-10 entries per row
    (gradients flow only through kept entries; rows are NOT renormalised).

The XLA path materialises the N×M matrix (≈100 MB at N=5k, fine in HBM)
and is what the training loss differentiates through;
`ops.pallas.pi_matmul` is the streaming fused inference alternative that
never materialises Π when only Π@V is needed — `pi_project` below picks
the implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import cdist, BIG


def soft_correspondence(
    feat_a: jax.Array,
    feat_b: jax.Array,
    alpha: jax.Array | float,
    mask_b: jax.Array | None = None,
) -> jax.Array:
    """Π_ab: (..., N, M) row-stochastic soft map from cloud a to cloud b."""
    d = cdist(feat_a, feat_b)
    logits = -alpha * d
    if mask_b is not None:
        logits = jnp.where(mask_b[..., None, :], logits, -BIG)
    return jax.nn.softmax(logits, axis=-1)


def topk_soft_correspondence(
    feat_a: jax.Array,
    feat_b: jax.Array,
    alpha: jax.Array | float,
    k: int = 10,
    mask_b: jax.Array | None = None,
    exact: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sparse representation of topk_sparsify(soft_correspondence(...)).

    Returns (vals, idx): vals[b, n, t] = Π[b, n, idx[b, n, t]] — the k
    largest entries per row of the FULL-row softmax (rows NOT renormalised,
    reference `topk_pi` models/loss.py:1339-1347).

    Gradients are identical to the dense path: vals = exp(logits_topk −
    logsumexp(all logits)), so the softmax's coupling to every logit flows
    through the logsumexp exactly as the dense softmax VJP restricted to
    the kept entries does (the zeroed entries carry no cotangent in the
    dense formulation). The N×M distance matrix is still formed, but the
    N×M×C downstream matmuls (map-loss contraction, Π@feat pulls,
    verts12 projection) collapse to N×k gathers — the training-step
    FLOP reduction VERDICT.md round-2 item 4 asks for.
    """
    logits = -alpha * cdist(feat_a, feat_b)
    if mask_b is not None:
        logits = jnp.where(mask_b[..., None, :], logits, -BIG)
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    if exact:
        _, idx = jax.lax.top_k(logits, k)
    else:
        # TPU-optimised partial reduction (exact top-k costs ~4x on an
        # N x N f32 block; the dense training path's topk_sparsify made
        # the same recall~0.98 trade). Exact on CPU.
        _, idx = jax.lax.approx_max_k(logits, k, recall_target=0.98)
    top_logits = jnp.take_along_axis(logits, idx, axis=-1)
    return jnp.exp(top_logits - lse), idx


def sparse_project(vals: jax.Array, idx: jax.Array, values: jax.Array) -> jax.Array:
    """Σ_t vals[b,n,t] · values[b, idx[b,n,t], ...] — sparse Π @ V.

    values: (B, M, *rest) -> (B, N, *rest). Equals
    soft_project(dense_pi, values) when (vals, idx) come from
    `topk_soft_correspondence` (ties aside)."""

    def one(v_b, i_b, val_b):
        g = v_b[i_b]  # (N, k, *rest)
        return jnp.einsum("nt,nt...->n...", val_b, g)

    return jax.vmap(one)(values, idx, vals)


def topk_sparsify(pi: jax.Array, k: int = 10, exact: bool = False) -> jax.Array:
    """Zero all but the k largest entries per row (no renormalisation)."""
    if exact:
        vals, _ = jax.lax.top_k(pi, k)
    else:
        # TPU-optimised partial reduction; exact on CPU (see ops.topk_min)
        vals, _ = jax.lax.approx_max_k(pi, k, recall_target=0.98)
    thresh = vals[..., -1:]
    # Keep entries >= the k-th largest. With strict ties this can keep more
    # than k entries; the reference scatter keeps exactly k, but softmax
    # rows have distinct values almost surely and gradients are identical.
    return jnp.where(pi >= thresh, pi, 0.0)


def soft_project(pi: jax.Array, values: jax.Array) -> jax.Array:
    """Π @ V — project target values through the soft map (loss.py:1408)."""
    return jnp.matmul(
        pi, values, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def pi_project(
    feat_a: jax.Array,
    feat_b: jax.Array,
    values: jax.Array,
    alpha: jax.Array | float,
    mask_b: jax.Array | None = None,
    *,
    topk: int = 10,
    impl: str | None = None,  # "pallas" | "xla" | None = auto
) -> jax.Array:
    """Fused chain topk_sparsify(soft_correspondence(...)) @ values.

    Inference entry point: on TPU it dispatches to the streaming Pallas
    kernel (Π never materialised); elsewhere it composes the XLA pieces
    above. The training loss calls the pieces directly (it differentiates
    through the saved softmax)."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and feat_a.ndim == 3:
        from dvmatcher_tpu.ops.pallas.pi_search import pi_matmul

        return pi_matmul(feat_a, feat_b, values, alpha, mask_b, topk=topk)
    pi = topk_sparsify(
        soft_correspondence(feat_a, feat_b, alpha, mask_b), topk, exact=True
    )
    return soft_project(pi, values)
