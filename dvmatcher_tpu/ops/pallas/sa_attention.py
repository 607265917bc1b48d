"""Streaming offset-attention kernel (SALayer hot path).

Reference semantics (models/model.py:97-123, PCT offset attention): with a
tied Q/K projection q = x W and values v, the N x N energy is the Gram
matrix E = q q^T (no sqrt-d scaling); attention is row-softmaxed then
column-renormalised:

    A = softmax_rows(E);  A~[i,j] = A[i,j] / (1e-9 + sum_i A[i,j])
    x_r[j] = sum_i A~[i,j] v[i]

The kernel streams row tiles: per tile it computes the row softmax of its
E block and accumulates both the column sums S[j] and the partial products
P[j] = sum_i A[i,j] v[i] (an MXU A^T V matmul); the output x_r = P / S is
emitted on the last tile. The N x N attention matrix never exists in HBM —
the XLA path materialises it (and saves it for backward); this is the
inference path, sharing parameters with the XLA module.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvmatcher_tpu.ops.geometry import BIG


def _kernel(q_tile_ref, q_ref, v_tile_ref, valid_ref, valid_tile_ref, o_ref,
            s_ref, p_acc, s_acc, *, precision: str, normalize: bool = True):
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        p_acc[...] = jnp.zeros_like(p_acc)
        s_acc[...] = jnp.zeros_like(s_acc)

    q_tile = q_tile_ref[0]  # (T, D)
    q_all = q_ref[0]  # (N, D)
    v_tile = v_tile_ref[0]  # (T, C)

    if precision == "fast":
        # Single-pass bf16 Gram energies with f32 accumulation (6x fewer
        # MXU passes than HIGHEST); softmax weights absorb the rounding.
        e = jnp.dot(
            q_tile.astype(jnp.bfloat16), q_all.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )  # (T, N)
    else:
        e = jnp.dot(
            q_tile, q_all.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (T, N)
    e = jnp.where(valid_ref[0] > 0, e, -BIG)  # mask padded columns
    m = jnp.max(e, axis=-1, keepdims=True)
    a = jnp.exp(e - m)  # UNNORMALISED row softmax numerator
    # fold the row normalisation AND the padded-row mask into one (T, 1)
    # weight applied to the small operands instead of two full (T, N)
    # passes (divide + mask multiply):
    #   a_n(i,j) = a(i,j) w_i,  w = row_mask / row_sum
    #   S[j] += sum_i a(i,j) w_i          (one fused multiply-reduce)
    #   P[j] += sum_i a(i,j) (w_i v_i)    (weight folded into v columns)
    w = valid_tile_ref[0].T / jnp.sum(a, axis=-1, keepdims=True)  # (T, 1)

    s_acc[...] += jnp.sum(a * w, axis=0, keepdims=True)  # (1, N)
    if precision == "fast":
        p_acc[...] += jnp.dot(
            a.T.astype(jnp.bfloat16), (v_tile * w).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (N, C)
    else:
        p_acc[...] += jnp.dot(
            a.T, v_tile * w,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (N, C)

    @pl.when(i == n_tiles - 1)
    def _():
        if normalize:
            o_ref[0] = p_acc[...] / (1e-9 + s_acc[...].T)
        else:
            # raw accumulators (the cross/sharded path: the caller psums
            # partials over devices before normalising)
            o_ref[0] = p_acc[...]
        s_ref[0] = s_acc[...]


@functools.partial(
    jax.jit, static_argnames=("tile", "precision", "return_colsum")
)
def sa_attention(
    q: jax.Array,  # (B, N, D) tied Q/K projection of x
    v: jax.Array,  # (B, N, C) values
    valid: jax.Array | None = None,  # (B, N)
    *,
    tile: int = 512,
    precision: str = "fast",
    return_colsum: bool = False,
):
    """Streaming double-normalised attention: returns x_r (B, N, C).

    precision="fast" (default): single-pass bf16 matmuls, f32 accumulation;
    "exact": f32 HIGHEST (tests/debug). return_colsum=True also returns
    the per-column softmax sums S (B, N) — the O(N) residual the fused
    backward kernel needs (saving S beats a second recompute sweep)."""
    b, n, d = q.shape
    c = v.shape[-1]
    pad = (-n) % tile
    valid_f = (
        jnp.ones((b, n), jnp.float32) if valid is None else valid.astype(jnp.float32)
    )
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, 0), (0, pad)))
    npad = n + pad

    interpret = jax.default_backend() != "tpu"
    out, s = pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid=(b, npad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, d), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, npad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, npad), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((npad, c), jnp.float32),
            pltpu.VMEM((1, npad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, q, v, valid_f[:, None, :], valid_f[:, None, :])
    if return_colsum:
        return out[:, :n], s[:, 0, :n]
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("tile", "precision"))
def sa_attention_cross_partials(
    q_rows: jax.Array,  # (B, Nr, D) — the row (query) slab
    q_all: jax.Array,  # (B, M, D) — all columns (keys; tied projection)
    v_rows: jax.Array,  # (B, Nr, C) — values live on the ROW side
    valid_all: jax.Array | None = None,  # (B, M) padded-column mask
    valid_rows: jax.Array | None = None,  # (B, Nr) padded-row mask
    *,
    tile: int = 512,
    precision: str = "fast",
):
    """Streaming offset-attention restricted to a row slab: returns the RAW
    column-indexed accumulators (P, S) with P (B, M, C) = sum_i A[i,j] v_i
    and S (B, M) = sum_i A[i,j], i ranging over `q_rows` only.

    This is the per-device kernel of the point-axis sharded SALayer
    (parallel/sharded_attention.py): each device streams its local row
    slab through VMEM exactly like the single-device kernel, then the
    partials combine across the mesh with psum_scatter and normalise as
    x_r = P / (1e-9 + S). Kernel body shared with `sa_attention`.
    """
    b, nr, d = q_rows.shape
    m = q_all.shape[1]
    c = v_rows.shape[-1]
    pad = (-nr) % tile
    padm = (-m) % 128  # columns ride the lane dimension
    row_f = (
        jnp.ones((b, nr), jnp.float32)
        if valid_rows is None
        else valid_rows.astype(jnp.float32)
    )
    col_f = (
        jnp.ones((b, m), jnp.float32)
        if valid_all is None
        else valid_all.astype(jnp.float32)
    )
    if pad:
        q_rows = jnp.pad(q_rows, ((0, 0), (0, pad), (0, 0)))
        v_rows = jnp.pad(v_rows, ((0, 0), (0, pad), (0, 0)))
        row_f = jnp.pad(row_f, ((0, 0), (0, pad)))
    if padm:
        q_all = jnp.pad(q_all, ((0, 0), (0, padm), (0, 0)))
        col_f = jnp.pad(col_f, ((0, 0), (0, padm)))
    nrp, mp = nr + pad, m + padm

    interpret = jax.default_backend() != "tpu"
    p_out, s_out = pl.pallas_call(
        functools.partial(_kernel, precision=precision, normalize=False),
        grid=(b, nrp // tile),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, d), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mp), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, mp, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, mp), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, mp, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, mp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp, c), jnp.float32),
            pltpu.VMEM((1, mp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_rows, q_all, v_rows, col_f[:, None, :], row_f[:, None, :])
    return p_out[:, :m], s_out[:, 0, :m]


def _sa_bwd_kernel(q_tile_ref, v_tile_ref, g_tile_ref, q_ref, g_ref,
                   s_ref, t_ref, valid_ref, valid_tile_ref,
                   dq_row_ref, dv_ref, dq_col_ref, *, precision: str):
    """Backward of the streaming offset attention, one row-tile per step.

    Math (forward: E=qq^T, A=softmax_rows(E)*row_mask, S[j]=col sums,
    out[j] = sum_i A[i,j] v[i] / (1e-9+S[j])):
      M[i,j]  = v[i].G[j]                      (the dA~ cotangent)
      T[j]    = out[j].G[j]                    (passed in, O(N) residual)
      dA[i,j] = row_mask_i * (M[i,j]-T[j]) / (1e-9+S[j])
      dE      = A*(dA - rowsum(A*dA))          (row-softmax VJP)
      dq      = dE @ q  +  dE^T @ q            (Gram symmetry; second term
                                                accumulates across tiles)
      dv[i]   = sum_j A[i,j]/(1e-9+S[j]) G[j]
    The N x N matrices exist only as VMEM row tiles — flash-style."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dq_col_ref[...] = jnp.zeros_like(dq_col_ref)

    q_tile = q_tile_ref[0]
    q_all = q_ref[0]
    v_tile = v_tile_ref[0]
    g_all = g_ref[0]

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

    # recompute the row-softmax block exactly as the forward does, keeping
    # the row normalisation + row mask folded into a (T, 1) weight `w`
    # (a_n = a w): every (T, N)-sized divide/mask pass becomes a small
    # post-matmul multiply on the (T, D)/(T, C) outputs or a fold into the
    # (T, *) matmul operands — zero extra big-block passes
    e = mm(q_tile, q_all.T)
    e = jnp.where(valid_ref[0] > 0, e, -BIG)
    m = jnp.max(e, axis=-1, keepdims=True)
    a = jnp.exp(e - m)  # UNNORMALISED (T, N)
    w = valid_tile_ref[0].T / jnp.sum(a, axis=-1, keepdims=True)  # (T, 1)

    inv_s = 1.0 / (1e-9 + s_ref[0])  # (1, N)
    m_blk = mm(v_tile, g_all.T)  # (T, N): M[i, j]
    da = (m_blk - t_ref[0]) * inv_s  # (T, N)
    r = jnp.sum(a * da, axis=-1, keepdims=True) * w  # (T, 1) = rowsum(a_n da)
    de = a * (da - r)  # (T, N); the row weight w is folded per consumer

    dq_row_ref[0] = mm(de, q_all) * w
    dq_col_ref[0] += mm(de.T, q_tile * w)
    dv_ref[0] = mm(a * inv_s, g_all) * w


@functools.partial(jax.jit, static_argnames=("tile", "precision"))
def sa_attention_bwd(
    q: jax.Array,
    v: jax.Array,
    g: jax.Array,  # (B, N, C) output cotangent
    out: jax.Array,  # (B, N, C) forward output (residual)
    s: jax.Array,  # (B, N) forward column sums (residual)
    valid: jax.Array | None = None,
    *,
    tile: int = 512,
    precision: str = "fast",
) -> tuple[jax.Array, jax.Array]:
    """(dq, dv) of `sa_attention` via the fused flash-style kernel."""
    b, n, d = q.shape
    c = v.shape[-1]
    t_vec = jnp.sum(out * g, axis=-1)  # (B, N)
    pad = (-n) % tile
    valid_f = (
        jnp.ones((b, n), jnp.float32) if valid is None else valid.astype(jnp.float32)
    )
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        t_vec = jnp.pad(t_vec, ((0, 0), (0, pad)))
        # padded columns must keep S>0 so inv_s stays finite; their A
        # entries are 0 so they contribute nothing
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=1.0)
        valid_f = jnp.pad(valid_f, ((0, 0), (0, pad)))
    npad = n + pad

    interpret = jax.default_backend() != "tpu"
    row_q = pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM)
    row_c = pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM)
    full_q = pl.BlockSpec((1, npad, d), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM)
    full_c = pl.BlockSpec((1, npad, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, npad), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM)
    dq_row, dv, dq_col = pl.pallas_call(
        functools.partial(_sa_bwd_kernel, precision=precision),
        grid=(b, npad // tile),
        in_specs=[
            row_q,  # q tile
            row_c,  # v tile
            row_c,  # g tile (unused per-row but kept for symmetry)
            full_q,  # q all
            full_c,  # g all
            vec,  # s
            vec,  # t
            vec,  # valid columns
            pl.BlockSpec((1, 1, tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[row_q, row_c, full_q],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, npad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        q, v, g, q, g,
        s[:, None, :], t_vec[:, None, :], valid_f[:, None, :],
        valid_f[:, None, :],
    )
    dq = dq_row[:, :n] + dq_col[:, :n]
    return dq, dv[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sa_attention_ad(q, v, valid, precision: str = "fast",
                    bwd_impl: str = "pallas"):
    """Differentiable wrapper: streaming kernel forward, flash-style
    fused backward (bwd_impl="pallas", default) or XLA-recompute
    ("xla", the round-2 fallback — materialises N x N in the backward)."""
    return sa_attention(q, v, valid, precision=precision)


def _sa_ad_fwd(q, v, valid, precision, bwd_impl):
    if bwd_impl == "pallas":
        out, s = sa_attention(
            q, v, valid, precision=precision, return_colsum=True
        )
        return out, (q, v, valid, out, s)
    return sa_attention(q, v, valid, precision=precision), (q, v, valid, None, None)


def _sa_ad_bwd(precision, bwd_impl, res, g):
    q, v, valid, out, s = res
    if bwd_impl == "pallas":
        dq, dv = sa_attention_bwd(
            q, v, g, out, s, valid, precision=precision
        )
        return dq, dv, None
    _, vjp = jax.vjp(lambda q_, v_: sa_attention_xla(q_, v_, valid), q, v)
    dq, dv = vjp(g)
    return dq, dv, None


sa_attention_ad.defvjp(_sa_ad_fwd, _sa_ad_bwd)


def sa_attention_xla(
    q: jax.Array, v: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Materialising reference implementation (autodiff/CPU path)."""
    e = jnp.matmul(
        q, jnp.swapaxes(q, -1, -2),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if valid is not None:
        e = jnp.where(valid[:, None, :], e, -BIG)
    a = jax.nn.softmax(e, axis=-1)
    if valid is not None:
        a = a * valid[:, :, None]
    a = a / (1e-9 + jnp.sum(a, axis=1, keepdims=True))
    return jnp.einsum("bij,bic->bjc", a, v, precision=jax.lax.Precision.HIGHEST)
