"""Point-axis (sequence-parallel) sharded correspondence ops.

The reference materialises full N x M matrices on one GPU (SA energies,
Pi soft maps, cdist searches — SURVEY.md section 2c). The single-device
TPU analog is the blocked/streaming Pallas kernels in ops.pallas; THIS
module is the multi-chip extension: the target cloud is sharded along its
point axis across the ICI mesh, every device computes its local slab, and
the results combine with XLA collectives (all_gather of per-slab
minima / online-softmax statistics). Lets correspondence search and soft
projection scale to clouds whose pairwise matrices exceed one chip's HBM.

Works under `shard_map` over a 1-D mesh; validated on the virtual 8-device
CPU mesh and exercised by the driver's multi-chip dry run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dvmatcher_tpu.ops.geometry import sq_dist


def sharded_nn_correspondence(
    feat_a: jax.Array,  # (N, C) — replicated
    feat_b: jax.Array,  # (M, C) — sharded over the mesh axis
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Global argmin_j ||a_i - b_j|| with b sharded along j. Returns (N,)."""
    n_dev = mesh.shape[axis]
    m_local = feat_b.shape[0] // n_dev

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def search(fa, fb_local):
        d = sq_dist(fa, fb_local)  # (N, m_local)
        local_val = jnp.min(d, axis=-1)
        local_idx = jnp.argmin(d, axis=-1) + jax.lax.axis_index(axis) * m_local
        vals = jax.lax.all_gather(local_val, axis)  # (n_dev, N)
        idxs = jax.lax.all_gather(local_idx, axis)
        best = jnp.argmin(vals, axis=0)  # (N,)
        return jnp.take_along_axis(idxs, best[None], axis=0)[0]

    return search(feat_a, feat_b)


def sharded_nn_search_padded(
    feat_a: jax.Array,  # (N, C) — replicated, padded
    feat_b: jax.Array,  # (M, C) — padded to a multiple of the mesh size
    n_b: int | jax.Array,  # count of valid rows of feat_b
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """`sharded_nn_correspondence` for padded static buckets (the cli/test
    path): padded target rows are pushed far away so they never win the
    argmin — masking without a mask under shard_map."""
    m = feat_b.shape[0]
    if m % mesh.shape[axis]:
        raise ValueError(
            f"target bucket {m} not divisible by mesh size {mesh.shape[axis]}"
        )
    far = jnp.where(
        (jnp.arange(m) < n_b)[:, None], feat_b, jnp.full_like(feat_b, 1e6)
    )
    return sharded_nn_correspondence(feat_a, far, mesh, axis)


def sharded_soft_project(
    feat_a: jax.Array,  # (N, C) replicated
    feat_b: jax.Array,  # (M, C) sharded over j
    values_b: jax.Array,  # (M, D) sharded over j
    alpha: float,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """(softmax_j(-alpha * ||a_i - b_j||) @ values)_i with the target axis
    sharded: an online-softmax across devices — each computes its slab's
    (max, sum-exp, weighted sum), combined with all_gathers. The (N, M)
    soft map never exists anywhere. Returns (N, D)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def project(fa, fb_local, vb_local):
        d = jnp.sqrt(jnp.maximum(sq_dist(fa, fb_local), 0.0))
        logits = -alpha * d  # (N, m_local)
        local_max = jnp.max(logits, axis=-1)  # (N,)
        e = jnp.exp(logits - local_max[:, None])
        local_sum = jnp.sum(e, axis=-1)  # (N,)
        local_ws = jnp.matmul(
            e, vb_local, precision=jax.lax.Precision.HIGHEST
        )  # (N, D)

        maxes = jax.lax.all_gather(local_max, axis)  # (n_dev, N)
        gmax = jnp.max(maxes, axis=0)  # (N,)
        scale = jnp.exp(local_max - gmax)  # (N,)
        tot_sum = jax.lax.psum(local_sum * scale, axis)
        tot_ws = jax.lax.psum(local_ws * scale[:, None], axis)
        return tot_ws / tot_sum[:, None]

    return project(feat_a, feat_b, values_b)
