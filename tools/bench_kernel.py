"""Microbenchmark the fused Pallas kernels in isolation on the TPU.

Times (honest per-rep scalar readback — the axon tunnel's
block_until_ready is a no-op) for each hot kernel at the bench shape
(B=16, N=4995), sweeping the knobs that matter:

  * knn_attention 64ch/128ch: precision fast vs exact, bisection rounds
  * sa_attention (streaming offset attention)
  * nn search (pi_search argmin)

The deltas tell where the next optimisation hour goes — e.g. the
select.py docstring records a 42 ms kNN-attention kernel at this shape
of which only ~6 ms is implied MXU work, so the gap (VPU sweeps, small-
matmul pipeline stalls) is the target.

    JAX_PLATFORMS=axon python tools/bench_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BK_B", 16))
N = int(os.environ.get("BK_N", 4995))
REPS = int(os.environ.get("BK_REPS", 5))


INNER = int(os.environ.get("BK_INNER", 10))


def timeit(fn, *args, **kw):
    """Time `fn` amortised over INNER in-dispatch repetitions.

    A per-call float() sync through the axon tunnel pays the full
    dispatch+readback RTT (~tens of ms) EVERY rep, which swamps ms-scale
    kernels — the first version of this tool measured exactly that (the
    'C=128 faster than C=64' artifact in ckpt/bench_kernel_r3.log is
    RTT + queueing, not kernel time). Here the kernel runs INNER times
    inside one jitted lax.scan (inputs scaled by a step-dependent factor
    so XLA cannot hoist the body), one scalar readback at the end; the
    RTT amortises to RTT/INNER."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def step(carry, i):
            s = 1.0 + 1e-6 * i.astype(jnp.float32)
            return carry + fn(*[x * s for x in a], **kw), None

        tot, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(INNER))
        return tot

    float(run(*args))  # warmup / compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / INNER


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.ops.pallas.knn_attention import knn_attention
    from dvmatcher_tpu.ops.pallas.sa_attention import sa_attention
    from dvmatcher_tpu.match import nn_correspondence

    key = jax.random.PRNGKey(0)

    for c, knn_k in ((64, 40), (128, 40)):
        x, q, k, v = (
            jax.random.normal(jax.random.fold_in(key, i), (B, N, c))
            for i in range(4)
        )
        for precision in ("fast", "exact"):
            f = jax.jit(
                lambda x, q, k, v, p=precision, kk=knn_k: jnp.sum(
                    knn_attention(x, q, k, v, knn_k=kk, heads=4, precision=p)
                )
            )
            dt = timeit(f, x, q, k, v)
            print(f"knn_attention C={c} {precision:5s}: {dt*1e3:7.2f} ms "
                  f"({B*N*1e-6/dt:6.1f} Mpts/s)")

    # SA layer shape: v (B, N, C) values, q = tied Q/K projection at C//4
    c = 64
    v = jax.random.normal(key, (B, N, c))
    qk = jax.random.normal(jax.random.fold_in(key, 9), (B, N, c // 4))
    for precision in ("fast", "exact"):
        f = jax.jit(
            lambda q_, v_, p=precision: jnp.sum(sa_attention(q_, v_, precision=p))
        )
        dt = timeit(f, qk, v)
        print(f"sa_attention C={c} {precision:5s}: {dt*1e3:7.2f} ms")

    fa = jax.random.normal(key, (B, N, 128))
    fb = jax.random.normal(jax.random.fold_in(key, 7), (B, N, 128))
    f = jax.jit(lambda a, b: jnp.sum(nn_correspondence(a, b)))
    dt = timeit(f, fa, fb)
    print(f"nn_correspondence 128d: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
