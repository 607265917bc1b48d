"""Fused Π soft-correspondence and hard-argmin search kernels.

Reference semantics (models/loss.py:110-114, 1339-1347; test.py:19-28):

  * `pi_matmul(fa, fb, V, alpha, k)` — the chain
        Π  = softmax_rows(-α · cdist(fa, fb))      (knnsearch_t_grad)
        Π' = top-k-sparsify(Π)  (no renormalise)    (topk_pi)
        out = Π' @ V                                 (loss.py:1408)
    computed per row-tile entirely in VMEM: the (N, M) distance matrix,
    the softmax and the sparsified Π never exist in HBM. The softmax
    denominator runs over ALL M columns (parity with the reference, which
    sparsifies AFTER the softmax); selection of the k largest Π entries ==
    k smallest distances (softmax is monotone), done by the shared
    value-bisection threshold (ops/pallas/select.py).

  * `nn_argmin(fa, fb)` — argmin_j ||fa_i - fb_j||² (hard correspondence,
    test.py:19-28) streamed the same way; returns (values, indices).

Both run in "fast" precision by default (compensated-bf16 distance matmul;
bf16 projection matmul) — see ops/pallas/select.py. These are inference
kernels; the training loss keeps the XLA chain in match/soft.py, whose
saved N×M softmax XLA differentiates directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvmatcher_tpu.ops.geometry import BIG
from dvmatcher_tpu.ops.pallas.select import (
    kth_smallest_for_precision,
    sq_dist_block,
)


def _pi_kernel(alpha_ref, fa_ref, fb_ref, v_ref, valid_ref, o_ref,
               *, topk: int, precision: str):
    fa = fa_ref[0]  # (T, C)
    fb = fb_ref[0]  # (M, C)
    vals = v_ref[0]  # (M, Cv)
    valid = valid_ref[0]  # (1, M)
    alpha = alpha_ref[0, 0]

    d = sq_dist_block(fa, fb, precision)
    # reference cdist is the euclidean (not squared) distance
    d = jnp.sqrt(d)
    d = d + (1.0 - valid) * BIG

    thr = kth_smallest_for_precision(d, topk, valid, precision)

    # stabilised softmax numerator: the max logit is at the min distance
    dmin = jnp.min(d, axis=-1, keepdims=True)
    w = jnp.where(valid > 0, jnp.exp(-alpha * (d - dmin)), 0.0)
    denom = jnp.sum(w, axis=-1, keepdims=True)
    ws = jnp.where(d <= thr, w, 0.0) / denom
    if precision == "fast":
        o_ref[0] = jnp.dot(
            ws.astype(jnp.bfloat16), vals.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        o_ref[0] = jnp.dot(
            ws, vals,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )


@functools.partial(
    jax.jit, static_argnames=("topk", "tile", "precision", "interpret")
)
def pi_matmul(
    feat_a: jax.Array,  # (B, N, C)
    feat_b: jax.Array,  # (B, M, C)
    values: jax.Array,  # (B, M, Cv)
    alpha: jax.Array | float,
    mask_b: jax.Array | None = None,  # (B, M) bool
    *,
    topk: int = 10,
    tile: int = 512,
    precision: str = "fast",
    interpret: bool | None = None,
) -> jax.Array:
    """topk_sparsify(softmax(-α·cdist(fa, fb))) @ values, fused. (B, N, Cv)."""
    b, n, c = feat_a.shape
    m = feat_b.shape[1]
    cv = values.shape[-1]
    pad_n = (-n) % tile
    valid_f = (
        jnp.ones((b, m), jnp.float32) if mask_b is None
        else mask_b.astype(jnp.float32)
    )
    fa = jnp.pad(feat_a, ((0, 0), (0, pad_n), (0, 0))) if pad_n else feat_a
    # pad M to the lane width so reductions see whole vectors
    pad_m = (-m) % 128
    fb = jnp.pad(feat_b, ((0, 0), (0, pad_m), (0, 0))) if pad_m else feat_b
    vv = jnp.pad(values, ((0, 0), (0, pad_m), (0, 0))) if pad_m else values
    valid_f = jnp.pad(valid_f, ((0, 0), (0, pad_m))) if pad_m else valid_f
    npad, mpad = n + pad_n, m + pad_m

    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_pi_kernel, topk=topk, precision=precision),
        grid=(b, npad // tile),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cv), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mpad), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, cv), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, npad, cv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(alpha_arr, fa, fb, vv, valid_f[:, None, :])
    return out[:, :n]


def _argmin_kernel(fa_ref, fb_ref, valid_ref, val_ref, idx_ref, *, precision: str):
    fa = fa_ref[0]  # (T, C)
    fb = fb_ref[0]  # (M, C)
    valid = valid_ref[0]  # (1, M)
    m = fb.shape[0]

    d = sq_dist_block(fa, fb, precision)
    d = d + (1.0 - valid) * BIG
    val = jnp.min(d, axis=-1, keepdims=True)  # (T, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    # lowest index among ties — argmin parity with jnp.argmin
    idx = jnp.min(jnp.where(d <= val, cols, m), axis=-1, keepdims=True)
    val_ref[0] = val
    idx_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("tile", "precision", "interpret"))
def nn_argmin(
    feat_a: jax.Array,  # (B, N, C)
    feat_b: jax.Array,  # (B, M, C)
    mask_b: jax.Array | None = None,
    *,
    tile: int = 512,
    precision: str = "fast",
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """

    Streaming hard NN search: (min sq-distances (B, N), argmin (B, N)).
    The (N, M) distance matrix never exists in HBM (the XLA path writes
    ~100 MB per pair at N=5k and reads it back for the argmin).
    """
    b, n, c = feat_a.shape
    m = feat_b.shape[1]
    pad_n = (-n) % tile
    valid_f = (
        jnp.ones((b, m), jnp.float32) if mask_b is None
        else mask_b.astype(jnp.float32)
    )
    fa = jnp.pad(feat_a, ((0, 0), (0, pad_n), (0, 0))) if pad_n else feat_a
    pad_m = (-m) % 128
    fb = jnp.pad(feat_b, ((0, 0), (0, pad_m), (0, 0))) if pad_m else feat_b
    valid_f = jnp.pad(valid_f, ((0, 0), (0, pad_m))) if pad_m else valid_f
    npad, mpad = n + pad_n, m + pad_m

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    val, idx = pl.pallas_call(
        functools.partial(_argmin_kernel, precision=precision),
        grid=(b, npad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mpad), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, 1), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, npad, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fa, fb, valid_f[:, None, :])
    return val[:, :n, 0], idx[:, :n, 0]
