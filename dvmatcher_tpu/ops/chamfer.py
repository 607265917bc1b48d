"""Bidirectional chamfer distance with nearest-neighbor indices.

TPU-native replacement for the reference's CUDA extension
`ChamferDistancePytorch.chamfer3D.dist_chamfer_3D.chamfer_3DDist`
(used at models/loss.py:1099,1120): returns *squared* distances and argmin
indices in both directions. Distance matrix work rides the MXU via the
matmul expansion; masked variants support padded/partial clouds (the
reference's partial loss takes one side only — models/loss.py:867-882).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import sq_dist, masked_argmin


def chamfer_squared(
    a: jax.Array,
    b: jax.Array,
    mask_a: jax.Array | None = None,
    mask_b: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(dist_a, dist_b, idx_a, idx_b) — squared NN distances both ways.

    a: (..., N, 3), b: (..., M, 3). dist_a: (..., N) squared distance from
    each point of `a` to its nearest point of `b`; idx_a the index into `b`.
    Masked-out *query* points report distance 0 (so sums ignore them);
    masked-out *target* points are never matched.
    """
    d = sq_dist(a, b)
    dist_a, idx_a = masked_argmin(d, mask_b)
    dist_b, idx_b = masked_argmin(jnp.swapaxes(d, -1, -2), mask_a)
    if mask_a is not None:
        dist_a = jnp.where(mask_a, dist_a, 0.0)
    if mask_b is not None:
        dist_b = jnp.where(mask_b, dist_b, 0.0)
    return dist_a, dist_b, idx_a, idx_b


def chamfer_loss(
    a: jax.Array,
    b: jax.Array,
    mask_a: jax.Array | None = None,
    mask_b: jax.Array | None = None,
    *,
    single_side: bool = False,
) -> jax.Array:
    """mean(dist_a) + mean(dist_b) (reference models/loss.py:1113-1123).

    With masks, means are over valid points. `single_side=True` returns only
    the a→b term (partial matching, models/loss.py:867-882).
    """
    dist_a, dist_b, _, _ = chamfer_squared(a, b, mask_a, mask_b)

    def _mean(d, m):
        if m is None:
            return jnp.mean(d, axis=-1)
        return jnp.sum(d, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1)

    loss = _mean(dist_a, mask_a)
    if not single_side:
        loss = loss + _mean(dist_b, mask_b)
    return jnp.mean(loss)
