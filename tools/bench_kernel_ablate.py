"""Timing-only ablations of the fused kNN-attention kernel.

The r3 microbench (ckpt/bench_kernel_r3.log) showed the kernel is
VPU-bound: C=128 (2x the MXU FLOPs of C=64) runs FASTER than C=64, so
the fixed per-tile VPU work — the 24-round k-th-smallest bisection and
the per-head full-(T,N) masked-softmax exp — dominates. These variants
keep the memory traffic and grid identical and knock out one component
at a time (numerics intentionally wrong; timing only):

  full      the shipped kernel body
  noexp     softmax exp replaced by the raw energies (masked + summed)
  nobisect  threshold fixed at a constant (selection skipped)
  nosoftmax selection + output matmul only (no energies at all)
  nodiv     normalisation moved AFTER the output matmul: the (T,N)
            divide becomes a (T,d_head) multiply (numerically valid —
            softmax normalisation is linear in the output)
  rounds12  12 bisection rounds instead of 24 (2x coarser threshold)
  expbf16   exp evaluated on bf16 energies (probe VPU bf16 throughput)

    JAX_PLATFORMS=axon python tools/bench_kernel_ablate.py
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvmatcher_tpu.ops.geometry import BIG
from dvmatcher_tpu.ops.pallas.select import kth_smallest_threshold, sq_dist_block

B = int(os.environ.get("BK_B", 16))
N = int(os.environ.get("BK_N", 4995))
REPS = int(os.environ.get("BK_REPS", 5))


def _kernel(x_tile_ref, q_tile_ref, x_ref, k_ref, v_ref, valid_ref, o_ref,
            *, knn_k: int, heads: int, variant: str):
    x_tile = x_tile_ref[0]
    x_all = x_ref[0]
    t, c = x_tile.shape
    d_head = c // heads

    d = sq_dist_block(x_tile, x_all, "fast")
    d = d + (1.0 - valid_ref[0]) * BIG
    if variant == "nobisect":
        thr = jnp.full((t, 1), 1.0, jnp.float32)
    elif variant.startswith("rounds"):
        thr = kth_smallest_threshold(
            d, knn_k, valid_ref[0], rounds=int(variant[6:])
        )
    else:
        thr = kth_smallest_threshold(d, knn_k, valid_ref[0])
    sel = d <= thr

    q = q_tile_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    scale = 1.0 / math.sqrt(d_head)

    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        if variant == "nosoftmax":
            a = sel.astype(jnp.float32)
        else:
            e = jnp.dot(
                q[:, sl].astype(jnp.bfloat16),
                k_all[:, sl].astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )
            if variant == "noexp":
                a = jnp.where(sel, e * scale, 0.0)
            else:
                a = jnp.where(sel, jnp.exp(jnp.clip(e * scale, -60.0, 60.0)), 0.0)
        if variant in ("nodiv", "rounds12", "rounds18") or variant == "nosoftmax":
            # normalisation after the value matmul (the shipped r4 kernel)
            recip = 1.0 / jnp.sum(a, axis=-1, keepdims=True)
            o = jnp.dot(
                a.astype(jnp.bfloat16),
                v_all[:, sl].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = o * recip
        else:
            a = a / jnp.sum(a, axis=-1, keepdims=True)
            o_ref[0, :, sl] = jnp.dot(
                a.astype(jnp.bfloat16),
                v_all[:, sl].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.jit, static_argnames=("knn_k", "heads", "tile", "variant"))
def run_variant(x, q, k, v, *, knn_k=40, heads=4, tile=512, variant="full"):
    b, n, c = x.shape
    pad = (-n) % tile
    valid_f = jnp.ones((b, n), jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, 0), (0, pad)))
    npad = n + pad
    out = pl.pallas_call(
        functools.partial(_kernel, knn_k=knn_k, heads=heads, variant=variant),
        grid=(b, npad // tile),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, q, x, k, v, valid_f[:, None, :])
    return jnp.sum(out[:, :n])


INNER = int(os.environ.get("BK_INNER", 10))


def timeit(fn, *args):
    """Amortised in-dispatch timing (see tools/bench_kernel.py): INNER
    reps inside one jitted lax.scan, step-scaled inputs to defeat
    hoisting, single scalar readback — the axon RTT divides by INNER."""

    @jax.jit
    def run(*a):
        def step(carry, i):
            s = 1.0 + 1e-6 * i.astype(jnp.float32)
            return carry + fn(*[x * s for x in a]), None

        tot, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(INNER))
        return tot

    float(run(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / INNER


def main():
    key = jax.random.PRNGKey(0)
    c = 64
    x, q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, N, c)) for i in range(4)
    )
    for variant in (
        "full", "nodiv", "noexp", "nobisect", "nosoftmax",
        "rounds18", "rounds12",
    ):
        f = jax.jit(lambda *a, vv=variant: run_variant(*a, variant=vv))
        dt = timeit(f, x, q, k, v)
        print(f"knn_attention C={c} {variant:9s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
