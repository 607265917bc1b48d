"""Farthest point sampling, fully on-device.

Semantics follow the reference FPS (models/model.py:48-63,
lib/deformation_graph_point.py:18-33): iteratively pick the point with the
largest min-distance to the selected set, starting from a given (or random)
seed index. The reference runs this as a Python loop of torch ops; here it
is a single `lax.scan`, so it lives inside jitted train steps (the reference
instead built deformation-graph nodes on the CPU every step —
models/loss.py:1325-1337).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import BIG


def farthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    *,
    start: jax.Array | int = 0,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Sample `npoint` indices from an (N, 3) cloud by farthest-point order.

    `start` is the seed index (the reference uses a uniform random seed;
    pass `jax.random.randint(key, (), 0, n)` for that behaviour).
    `mask` (N,) bool marks valid points; padded points are never selected.
    Returns (npoint,) int32. Batch with `jax.vmap`.
    """
    n = xyz.shape[0]
    start = jnp.asarray(start, jnp.int32)
    valid = None if mask is None else jnp.asarray(mask, bool)

    def body(carry, _):
        min_d, farthest = carry
        centroid = xyz[farthest]
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        scored = min_d if valid is None else jnp.where(valid, min_d, -BIG)
        nxt = jnp.argmax(scored).astype(jnp.int32)
        return (min_d, nxt), farthest

    init = (jnp.full((n,), BIG, xyz.dtype), start)
    _, idx = jax.lax.scan(body, init, None, length=npoint)
    return idx
