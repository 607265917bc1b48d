"""Pairwise-distance and gather primitives.

Semantics match the reference implementation's helpers (for parity testing):
  * kNN via the matmul expansion of squared distance — reference
    misc/utils.py:7-18 (`knn`), models/model.py:267-278 (`knn_new`),
    models/loss.py:97-101 (`knn_grad`).
  * `index_points` — reference models/model.py:255-264.
  * `cdist` + softmax soft-map — reference models/loss.py:110-114.

TPU notes: the matmul expansion puts the O(N·M·C) work on the MXU; the
N×M matrix is materialised in HBM at this level. The fused Pallas kernels
in `ops.pallas` stream it instead; these XLA versions are the reference
path and the CPU/test fallback.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

BIG = 1e10


def sq_dist(
    a: jax.Array,
    b: jax.Array,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Squared euclidean distance matrix.

    a: (..., N, C), b: (..., M, C) -> (..., N, M), clamped at 0.

    Full f32 matmul precision by default: on TPU the MXU's default bf16
    passes perturb distances enough to flip nearest-neighbor indices, which
    the correspondence losses are built on.
    """
    aa = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., N, 1)
    bb = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    inner = jnp.matmul(
        a,
        jnp.swapaxes(b, -1, -2),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    d = aa - 2.0 * inner + jnp.swapaxes(bb, -1, -2)
    return jnp.maximum(d, 0.0)


@jax.custom_jvp
def _safe_sqrt(x: jax.Array) -> jax.Array:
    return jnp.sqrt(x)


@_safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    y = jnp.sqrt(x)
    # Zero (sub)gradient at 0 instead of inf — torch.norm's convention, which
    # the reference training relies on (neighbor differences include self).
    deriv = jnp.where(x > 0.0, 0.5 / jnp.where(x > 0.0, y, 1.0), 0.0)
    return y, deriv * t


def cdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance matrix with safe gradients at zero distance."""
    return _safe_sqrt(sq_dist(a, b))


def safe_norm(x: jax.Array, axis: int = -1, keepdims: bool = False) -> jax.Array:
    """L2 norm with zero gradient at the origin (torch.norm parity)."""
    return _safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def index_points_single(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of an unbatched point/feature array.

    points: (N, C), idx: int array of any shape S -> (S..., C).
    """
    return jnp.take(points, idx, axis=0)


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row gather (reference models/model.py:255-264).

    points: (B, N, C), idx: (B, S...) -> (B, S..., C).
    """
    return jax.vmap(index_points_single)(points, idx)


def _masked(d: jax.Array, mask_b: jax.Array | None) -> jax.Array:
    if mask_b is None:
        return d
    # mask_b: (..., M) — True for valid columns.
    return jnp.where(mask_b[..., None, :], d, BIG)


def topk_min(
    d: jax.Array, k: int, exact: bool = False
) -> tuple[jax.Array, jax.Array]:
    """(values, indices) of the k smallest entries along the last axis.

    exact=False uses `lax.approx_min_k` — the TPU-optimised partial
    reduction (recall ~0.98 per element); on CPU it lowers to the exact
    top-k, so oracle tests are bitwise. Exact `lax.top_k` on an N x N f32
    matrix costs ~4x more on TPU (measured 0.23s vs 0.05s at N=5k), and kNN
    selection dominates the backbone, so approximate is the default — the
    attention neighborhoods and sampled distance profiles are statistically
    insensitive to ~2/100 swapped far neighbors.
    """
    if exact:
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx
    return jax.lax.approx_min_k(d, k, recall_target=0.98)


def knn_idx(
    a: jax.Array,
    b: jax.Array,
    k: int,
    mask_b: jax.Array | None = None,
    exact: bool = False,
) -> jax.Array:
    """Indices of the k nearest rows of `b` for every row of `a`.

    a: (..., N, C), b: (..., M, C) -> (..., N, k) int32.
    Matches the reference's `topk(-sq_dist)` ordering (ties broken by index).
    """
    d = _masked(sq_dist(a, b), mask_b)
    return topk_min(d, k, exact)[1]


def knn_with_dist(
    a: jax.Array,
    b: jax.Array,
    k: int,
    mask_b: jax.Array | None = None,
    exact: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(squared distances, indices) of the k nearest rows of b per row of a."""
    d = _masked(sq_dist(a, b), mask_b)
    return topk_min(d, k, exact)


def masked_argmin(
    d: jax.Array, mask_b: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """(min values, argmin indices) over the last axis, skipping masked cols."""
    d = _masked(d, mask_b)
    idx = jnp.argmin(d, axis=-1)
    val = jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
    return val, idx
