"""Point-axis (sequence-parallel) attention collectives for the backbone.

The reference materialises every N x N structure of the backbone on one
GPU (SA energies models/model.py:117-120, kNN graphs via full cdist
models/model.py:267-278) — its scale ceiling is HBM-N^2 on a single
device. The single-device TPU answer is the streaming Pallas kernels in
ops/pallas; THIS module is the multi-chip extension for the *backbone
forward itself*: the point cloud is sharded along its point axis across
the ICI mesh, each device computes attention for its local slab of query
points, and the cross-device structure is carried by XLA collectives:

  * kNN attention: keys/values are `all_gather`ed (O(N*C) — megabytes,
    vs the O(N^2) distance/attention structure which stays sharded);
    each device builds the kNN graph and attends only for its rows.
  * offset attention (SALayer): the double normalisation couples all
    queries i and keys j (column sums run over i, the output is indexed
    by j — ops/pallas/sa_attention.py). Each device row-softmaxes its
    (n_local, N) energy slab, then the column-indexed numerator/
    denominator partials are combined with `psum_scatter` (a
    reduce-scatter riding ICI) so each device ends with exactly its
    output slab.

All functions assume they run inside `shard_map` over a mesh with the
named axis `axis`, with the point dimension evenly divided (static padded
buckets — the framework's shapes are already padded multiples). Used by
models/{layers,backbone}.py when `shard_axis` is set, driven by
parallel/sharded_backbone.py, and validated for numeric parity with the
single-device forward on the virtual 8-device CPU mesh
(tests/test_sharded_backbone.py) and the driver dry run.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import BIG, index_points, knn_idx


def sharded_knn_attention(
    x: jax.Array,  # (B, n_local, C) current features — distance space
    q: jax.Array,  # (B, n_local, C) = x W_q
    k: jax.Array,  # (B, n_local, C) = x W_k
    v: jax.Array,  # (B, n_local, C) = x W_v
    knn_k: int,
    heads: int,
    axis: str,
    mask: jax.Array | None = None,  # (B, n_local) — local slab of the
    # padded-point mask; gathered for neighbor selection
    exact: bool = False,
    use_kernel: bool = False,
) -> jax.Array:
    """N2P attention (models/model.py:325-395) with the point axis sharded.

    Neighbor-difference keys/values over the exact global kNN of each
    local query row; only the (N, C) key/value tensors are gathered, the
    (n_local, N) distance block lives on one device only. With
    `use_kernel`, each device runs the fused streaming Pallas kernel on
    its slab (`ops.pallas.knn_attention_cross`) — the multi-chip forward
    keeps the single-chip kernel's VMEM-resident distance tiles.
    """
    b, n_loc, c = x.shape
    d_head = c // heads
    x_all = jax.lax.all_gather(x, axis, axis=1, tiled=True)  # (B, N, C)
    k_all = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    v_all = jax.lax.all_gather(v, axis, axis=1, tiled=True)
    mask_all = (
        None
        if mask is None
        else jax.lax.all_gather(mask, axis, axis=1, tiled=True)  # (B, N)
    )

    if use_kernel:
        from dvmatcher_tpu.ops.pallas.knn_attention import knn_attention_cross

        return knn_attention_cross(
            x, q, v, x_all, k_all, v_all, mask_all,
            knn_k=knn_k, heads=heads,
        )

    idx = knn_idx(x, x_all, knn_k, mask_b=mask_all, exact=exact)
    k_n = index_points(k_all, idx) - k[:, :, None, :]  # difference keys
    v_n = index_points(v_all, idx) - v[:, :, None, :]

    qh = q.reshape(b, n_loc, heads, d_head)
    kh = k_n.reshape(b, n_loc, knn_k, heads, d_head)
    vh = v_n.reshape(b, n_loc, knn_k, heads, d_head)
    e = jnp.einsum(
        "bnhd,bnkhd->bnhk", qh, kh, precision=jax.lax.Precision.HIGHEST
    ) / math.sqrt(d_head)
    a = jax.nn.softmax(e, axis=-1)
    out = jnp.einsum(
        "bnhk,bnkhd->bnhd", a, vh, precision=jax.lax.Precision.HIGHEST
    )
    return out.reshape(b, n_loc, c)


def sharded_sa_attention(
    q: jax.Array,  # (B, n_local, D) tied Q/K projection
    v: jax.Array,  # (B, n_local, C) values
    axis: str,
    mask: jax.Array | None = None,  # (B, n_local) local padded-point mask
    use_kernel: bool = False,
) -> jax.Array:
    """Double-normalised offset attention (models/model.py:97-123) with the
    point axis sharded; returns the local slab of x_r (B, n_local, C).

    x_r[j] = sum_i A~[i,j] v[i] with A~ column-renormalised — the column
    sums and the numerator both reduce over the sharded query axis i, so
    one `psum_scatter` each delivers the local output slab directly (no
    device ever holds the full (N, N) attention or even the full (N, C)
    reduced output). With `use_kernel`, each device streams its row slab
    through the fused Pallas kernel (`sa_attention_cross_partials`) and
    only the raw O(N·C) accumulators cross the ICI.
    """
    q_all = jax.lax.all_gather(q, axis, axis=1, tiled=True)  # (B, N, D)
    if use_kernel:
        from dvmatcher_tpu.ops.pallas.sa_attention import (
            sa_attention_cross_partials,
        )

        mask_all = (
            None
            if mask is None
            else jax.lax.all_gather(mask, axis, axis=1, tiled=True)
        )
        p_part, s_part = sa_attention_cross_partials(
            q, q_all, v, mask_all, mask
        )  # (B, N, C), (B, N) — partial over local rows
        num = jax.lax.psum_scatter(
            p_part, axis, scatter_dimension=1, tiled=True
        )
        den = jax.lax.psum_scatter(
            s_part, axis, scatter_dimension=1, tiled=True
        )
        return num / (1e-9 + den[..., None])
    e = jnp.matmul(
        q,
        jnp.swapaxes(q_all, -1, -2),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (B, n_local, N): rows = local queries i, cols = all points j
    if mask is not None:
        mask_all = jax.lax.all_gather(mask, axis, axis=1, tiled=True)
        e = jnp.where(mask_all[:, None, :], e, -BIG)  # mask padded columns
    a = jax.nn.softmax(e, axis=-1)
    if mask is not None:
        a = a * mask[:, :, None]  # padded query rows out of the column sums
    num_part = jnp.einsum(
        "bij,bic->bjc", a, v, precision=jax.lax.Precision.HIGHEST
    )  # (B, N, C) — partial over local i
    den_part = jnp.sum(a, axis=1)  # (B, N)
    num = jax.lax.psum_scatter(
        num_part, axis, scatter_dimension=1, tiled=True
    )  # (B, n_local, C)
    den = jax.lax.psum_scatter(den_part, axis, scatter_dimension=1, tiled=True)
    return num / (1e-9 + den[..., None])
