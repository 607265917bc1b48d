"""Fused kNN attention kernel — the N2PAttention hot path.

Reference semantics (models/model.py:325-360): for each point i, attend
over its K nearest neighbors j (k-NN in the current feature space) with
queries q_i = W_q x_i, keys/values computed from the *neighbor difference*
(x_j - x_i):

    e_ij = q_i . W_k (x_j - x_i) / sqrt(D)
    a_i  = softmax_j(e_ij)   over the K selected neighbors
    o_i  = sum_j a_ij W_v (x_j - x_i)

Two identities make this streamable with zero gathers:
  * W_k (x_j - x_i) = (W_k x_j) - (W_k x_i); the -q_i.(W_k x_i) term is
    constant per row i, so it cancels inside the softmax.
  * sum_j a_ij W_v (x_j - x_i) = (A (W_v x))_i - (W_v x)_i since the a_ij
    sum to 1.

So the kernel computes, per row-tile of points:
  1. the squared-distance block d = ||x_i - x_j||^2 (MXU),
  2. the K-th-smallest distance per row by value bisection
     (24 VPU count-sweeps over the tile, all in VMEM),
  3. per head: masked softmax over e = q K^T restricted to d <= threshold,
     then o = A V (MXU),
finally o_i -= v_i outside. The (B, N, K, C) gathered-neighbor tensor of
the XLA path (~200 MB at N=5k) never exists, and the N x N distance matrix
never leaves VMEM.

Selection note: rows whose K-th smallest distance ties select all tied
columns (the XLA/reference top-k picks lowest index); softmax weights make
the difference negligible and tests use generic-position clouds.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvmatcher_tpu.ops.geometry import BIG, knn_idx, index_points
from dvmatcher_tpu.ops.pallas.select import (
    kth_smallest_for_precision,
    sq_dist_block,
)


def _kernel(x_tile_ref, q_tile_ref, x_ref, k_ref, v_ref, valid_ref, o_ref,
            *, knn_k: int, heads: int, precision: str):
    """One (tile of rows) x (all columns) block of fused kNN attention."""
    x_tile = x_tile_ref[0]  # (T, C)
    x_all = x_ref[0]  # (N, C)
    t, c = x_tile.shape
    n = x_all.shape[0]
    d_head = c // heads

    # squared distances (T, N) on the MXU (compensated bf16 when fast)
    d = sq_dist_block(x_tile, x_all, precision)
    # mask out padded columns
    d = d + (1.0 - valid_ref[0]) * BIG  # valid block: (1, 1, N) f32 0/1

    # Per-row K-th-smallest threshold (precision-tied selection; see
    # ops/pallas/select.py for the invariant and round count rationale)
    valid_row = valid_ref[0]  # (1, N)
    thr = kth_smallest_for_precision(d, knn_k, valid_row, precision)

    q = q_tile_ref[0]  # (T, C)
    k_all = k_ref[0]  # (N, C)
    v_all = v_ref[0]  # (N, C)
    scale = 1.0 / math.sqrt(d_head)

    sel = d <= thr
    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        if precision == "fast":
            # bf16 energies/values with f32 accumulation: 1 MXU pass vs 6.
            # ~1e-2 max relative output error (softmax-weight rounding),
            # quality-neutral for descriptor matching (see test suite).
            e = jnp.dot(
                q[:, sl].astype(jnp.bfloat16),
                k_all[:, sl].astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )
        else:
            e = jnp.dot(
                q[:, sl], k_all[:, sl].T,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        # softmax without the max-subtraction pass: energies are clipped to
        # +-60, so exp stays in f32 range even summed over N; relative
        # weights (hence the softmax) are unchanged (verified 3e-6 vs the
        # stabilised XLA path).
        # SAFETY INVARIANT (ties the clip constant to the post-matmul
        # normalisation below): the unnormalised numerator `a @ v` must stay
        # finite in f32, i.e. clip_hi + ln(N) + ln(max|v|) < ln(f32_max)=88.7.
        # With clip_hi=60 and N<=2^16 (ln=11.1) that leaves |v| < e^17 ~ 2e7
        # of headroom — values here are unit-scale features. Raising the clip
        # bound or feeding large-magnitude v requires restoring row-max
        # subtraction (as the backward kernel does).
        a = jnp.where(sel, jnp.exp(jnp.clip(e * scale, -60.0, 60.0)), 0.0)
        # normalisation AFTER the value matmul: softmax normalisation is
        # linear in the output, so the full (T, N) divide becomes a (T, 1)
        # reciprocal + (T, d_head) broadcast multiply — one fewer VPU pass
        # over the big block per head
        recip = 1.0 / jnp.sum(a, axis=-1, keepdims=True)
        if precision == "fast":
            o = jnp.dot(
                a.astype(jnp.bfloat16),
                v_all[:, sl].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            o = jnp.dot(
                a, v_all[:, sl],
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        o_ref[0, :, sl] = o * recip


@functools.partial(jax.jit, static_argnames=("knn_k", "heads", "tile", "precision"))
def knn_attention(
    x: jax.Array,  # (B, N, C) current features (distance space)
    q: jax.Array,  # (B, N, C) = x W_q
    k: jax.Array,  # (B, N, C) = x W_k
    v: jax.Array,  # (B, N, C) = x W_v
    valid: jax.Array | None = None,  # (B, N) bool — padded-column mask
    *,
    knn_k: int = 40,
    heads: int = 4,
    tile: int = 512,
    precision: str = "fast",
) -> jax.Array:
    """Fused kNN attention. Returns (B, N, C): sum_j a_ij (v_j - v_i).

    precision="fast" (default, the inference path): compensated-bf16
    distance matmul (3 MXU passes, ~2^-17 relative) + single-pass bf16
    energy/value matmuls — 2.7x faster than "exact" on v5e at N=5k.
    precision="exact": full f32 HIGHEST matmuls everywhere (tests/debug).
    """
    b, n, c = x.shape
    pad = (-n) % tile
    if valid is None:
        valid_f = jnp.ones((b, n), jnp.float32)
    else:
        valid_f = valid.astype(jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, 0), (0, pad)))
    npad = n + pad

    grid = (b, npad // tile)
    # CPU (tests) runs the same kernel through the Pallas interpreter
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, knn_k=knn_k, heads=heads, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, q, x, k, v, valid_f[:, None, :])  # x passed twice: row-tile + full view
    out = out[:, :n] - v[:, :n]  # the -v_i term of sum_j a_ij (v_j - v_i)
    return out


@functools.partial(jax.jit, static_argnames=("knn_k", "heads", "tile", "precision"))
def knn_attention_cross(
    x_q: jax.Array,  # (B, Nq, C) query-side features (distance space)
    q: jax.Array,  # (B, Nq, C) = x_q W_q
    v_q: jax.Array,  # (B, Nq, C) = x_q W_v (for the -v_i difference term)
    x_kv: jax.Array,  # (B, M, C) key-side features
    k_kv: jax.Array,  # (B, M, C) = x_kv W_k
    v_kv: jax.Array,  # (B, M, C) = x_kv W_v
    valid_kv: jax.Array | None = None,  # (B, M) — padded-column mask
    *,
    knn_k: int = 40,
    heads: int = 4,
    tile: int = 512,
    precision: str = "fast",
) -> jax.Array:
    """`knn_attention` with distinct query/key point sets.

    Each query row i attends over its knn_k nearest rows of `x_kv`
    (difference keys/values: sum_j a_ij (v_kv_j - v_q_i)). The row and
    column sets are independent arrays, which is exactly the shape of the
    point-axis sharded forward (parallel/sharded_attention.py): rows =
    the local slab, columns = the all_gather'd cloud — so every shard of
    a multi-chip forward runs this same fused kernel, identical math to
    the single-device path. The grid tiles only the query rows; the
    kernel body is shared with `knn_attention`.
    """
    b, nq, c = x_q.shape
    m = x_kv.shape[1]
    padq = (-nq) % tile
    padm = (-m) % 128  # column dim rides the TPU lane dimension
    if valid_kv is None:
        valid_f = jnp.ones((b, m), jnp.float32)
    else:
        valid_f = valid_kv.astype(jnp.float32)
    if padq:
        x_q = jnp.pad(x_q, ((0, 0), (0, padq), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, padq), (0, 0)))
    if padm:
        x_kv = jnp.pad(x_kv, ((0, 0), (0, padm), (0, 0)))
        k_kv = jnp.pad(k_kv, ((0, 0), (0, padm), (0, 0)))
        v_kv = jnp.pad(v_kv, ((0, 0), (0, padm), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, 0), (0, padm)))
    nqp, mp = nq + padq, m + padm

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, knn_k=knn_k, heads=heads, precision=precision),
        grid=(b, nqp // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mp), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nqp, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_q, q, x_kv, k_kv, v_kv, valid_f[:, None, :])
    return out[:, :nq] - v_q


def _bwd_kernel(x_tile_ref, q_tile_ref, g_tile_ref, x_ref, k_ref, v_ref,
                valid_ref, dq_ref, dk_ref, dv_ref,
                *, knn_k: int, heads: int, precision: str):
    """Backward of the fused kNN attention, one row-tile per grid step.

    Flash-style: the (T, N) distance block, selection, and softmax are
    RECOMPUTED in VMEM (nothing N x N was saved by the forward); the four
    gradient matmuls run on the MXU. dk/dv accumulate across row tiles
    into revisited output blocks (their index_map ignores the tile index,
    so the block stays resident until the batch index advances)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    x_tile = x_tile_ref[0]
    x_all = x_ref[0]
    t, c = x_tile.shape
    d_head = c // heads

    d = sq_dist_block(x_tile, x_all, precision)
    d = d + (1.0 - valid_ref[0]) * BIG
    thr = kth_smallest_for_precision(d, knn_k, valid_ref[0], precision)
    sel = d <= thr

    q = q_tile_ref[0]
    g = g_tile_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    scale = 1.0 / math.sqrt(d_head)

    def mm(a_, b_):
        if precision == "fast":
            return jnp.dot(
                a_.astype(jnp.bfloat16), b_.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return jnp.dot(
            a_, b_, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        e = mm(q[:, sl], k_all[:, sl].T) * scale  # (T, N)
        e = jnp.where(sel, e, -jnp.inf)
        m = jnp.max(e, axis=-1, keepdims=True)
        a = jnp.exp(e - m)  # UNNORMALISED (T, N), 0 off-selection
        # fold the softmax normalisation into (T, 1)/(T, d_head) factors
        # instead of a full (T, N) divide (same trick as the forward):
        #   a_n = a * recip;  rowdot = sum(a_n da) = recip * sum(a da);
        #   de  = a_n (da - rowdot) scale = a (da - rowdot) (scale recip);
        #   dv += a_n^T g = a^T (g recip)
        recip = 1.0 / jnp.sum(a, axis=-1, keepdims=True)  # (T, 1)

        da = mm(g[:, sl], v_all[:, sl].T)  # (T, N)
        rowdot = jnp.sum(a * da, axis=-1, keepdims=True) * recip  # (T, 1)
        de = a * (da - rowdot) * (scale * recip)  # (T, N)

        dq_ref[0, :, sl] = mm(de, k_all[:, sl])
        dk_ref[0, :, sl] += mm(de.T, q[:, sl])
        dv_ref[0, :, sl] += mm(a.T, g[:, sl] * recip)


@functools.partial(
    jax.jit, static_argnames=("knn_k", "heads", "tile", "precision")
)
def knn_attention_bwd(
    x: jax.Array,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,  # (B, N, C) output cotangent (w.r.t. A v, pre "-v" term)
    valid: jax.Array | None = None,
    *,
    knn_k: int = 40,
    heads: int = 4,
    tile: int = 512,
    precision: str = "fast",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(dq, dk, dv) of `knn_attention`'s A·v part (selection not
    differentiated, torch.topk parity; x receives no gradient)."""
    b, n, c = x.shape
    pad = (-n) % tile
    if valid is None:
        valid_f = jnp.ones((b, n), jnp.float32)
    else:
        valid_f = valid.astype(jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, 0), (0, pad)))
    npad = n + pad

    grid = (b, npad // tile)
    interpret = jax.default_backend() != "tpu"
    row_spec = pl.BlockSpec(
        (1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        (1, npad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, knn_k=knn_k, heads=heads, precision=precision
        ),
        grid=grid,
        in_specs=[
            row_spec,  # x row tile
            row_spec,  # q row tile
            row_spec,  # g row tile
            full_spec,  # x all
            full_spec,  # k all
            full_spec,  # v all
            pl.BlockSpec(
                (1, 1, npad), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[row_spec, full_spec, full_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, q, g, x, k, v, valid_f[:, None, :])
    return dq[:, :n], dk[:, :n], dv[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def knn_attention_ad(x, q, k, v, valid, knn_k: int, heads: int,
                     precision: str = "fast", bwd_impl: str = "pallas"):
    """Differentiable wrapper: Pallas kernel forward, flash-style
    recompute backward — nothing N x N is ever saved. bwd_impl="pallas"
    (default) runs the fused `_bwd_kernel`; "xla" re-runs the gather-based
    XLA path's VJP (the round-2 fallback). Gradients don't flow through
    the neighbor *selection* (top-k indices), matching torch.topk
    semantics in the reference."""
    return knn_attention(x, q, k, v, valid, knn_k=knn_k, heads=heads,
                         precision=precision)


def _knn_ad_fwd(x, q, k, v, valid, knn_k, heads, precision, bwd_impl):
    out = knn_attention(x, q, k, v, valid, knn_k=knn_k, heads=heads,
                        precision=precision)
    return out, (x, q, k, v, valid)


def _knn_ad_bwd(knn_k, heads, precision, bwd_impl, res, g):
    x, q, k, v, valid = res
    if bwd_impl == "pallas":
        dq, dk, dv = knn_attention_bwd(
            x, q, k, v, g, valid, knn_k=knn_k, heads=heads,
            precision=precision,
        )
        # forward wrapper computes out = (A v)_i - v_i, so -v adds -g
        return jnp.zeros_like(x), dq, dk, dv - g, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_: knn_attention_xla(
            x, q_, k_, v_, valid, knn_k=knn_k, heads=heads, exact=True
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return jnp.zeros_like(x), dq, dk, dv, None


knn_attention_ad.defvjp(_knn_ad_fwd, _knn_ad_bwd)


def knn_attention_xla(
    x: jax.Array,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: jax.Array | None = None,
    *,
    knn_k: int = 40,
    heads: int = 4,
    exact: bool = False,
) -> jax.Array:
    """Reference XLA implementation (gather-based), for CPU/tests/backward.

    Numerically identical semantics to the kernel: attention over exact
    kNN with difference keys/values."""
    b, n, c = x.shape
    d_head = c // heads
    idx = knn_idx(x, x, knn_k, mask_b=valid, exact=exact)  # (B, N, K)
    k_n = index_points(k, idx) - k[:, :, None, :]  # (B, N, K, C) diff keys
    v_n = index_points(v, idx) - v[:, :, None, :]
    qh = q.reshape(b, n, heads, d_head)
    kh = k_n.reshape(b, n, knn_k, heads, d_head)
    vh = v_n.reshape(b, n, knn_k, heads, d_head)
    e = jnp.einsum(
        "bnhd,bnkhd->bnhk", qh, kh, precision=jax.lax.Precision.HIGHEST
    ) / math.sqrt(d_head)
    a = jax.nn.softmax(e, axis=-1)
    out = jnp.einsum(
        "bnhk,bnkhd->bnhd", a, vh, precision=jax.lax.Precision.HIGHEST
    )
    return out.reshape(b, n, c)
