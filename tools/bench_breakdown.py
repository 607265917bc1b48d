"""Piecewise timing of the headline-inference pipeline on the attached TPU.

Times each stage of bench.py's per-pair work in isolation (same shapes,
same batch) with honest scalar readbacks per repetition (axon
block_until_ready is a no-op — tools/probe_train_step.py pattern):

  * full pipeline      (2 backbone forwards + 2 NN searches)
  * backbone forward   (one, batched)
  * lift conv          (1152->384 projection alone)
  * towers             (backbone minus the final NN search context)
  * nn search          (one dense 128-d argmin)

Prints seconds/batch and derived pairs/s per stage; the deltas say where
the next kernel hour should go.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
N = 4995
REPS = 5


def timeit(fn, *args) -> float:
    # The warmup MUST sync (float()): a bare fn(*args) returns after the
    # async dispatch is enqueued, so the first timed rep pays the whole
    # compile — the committed first run of this tool showed the "full
    # pipeline" at 81.7 s/batch, which was ~400 s of f32-graph XLA
    # compile amortised over 5 reps, not pipeline time (the per-stage
    # rows in the same log were warm and correct).
    float(fn(*args))  # warm/compile, synced
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(*args))  # scalar readback = sync point over the tunnel
    return (time.perf_counter() - t0) / REPS


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.data import read_off
    from dvmatcher_tpu.data.dataset import fps_numpy
    from dvmatcher_tpu.match import nn_correspondence
    from dvmatcher_tpu.models import Uni3FC

    shapes = []
    for name in ("mesh052", "mesh053"):
        verts, _ = read_off(f"/root/reference/data/scape_r/shapes_test/{name}.off")
        shapes.append(verts[fps_numpy(verts, N)])

    import os

    dtype = jnp.bfloat16 if os.environ.get("DVM_BENCH_DTYPE", "f32") == "bf16" else None
    backbone = Uni3FC(k=40, use_kernel=True, dtype=dtype)
    xyz0 = jnp.asarray(np.stack([shapes[0]] * BATCH))
    xyz1 = jnp.asarray(np.stack([shapes[1]] * BATCH))
    f0 = jax.random.normal(jax.random.PRNGKey(0), (BATCH, N, 1152))
    f1 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, N, 1152))
    variables = backbone.init(jax.random.PRNGKey(2), xyz0[:1], f0[:1], False)

    @jax.jit
    def full(v, xa, fa, xb, fb):
        da, _ = backbone.apply(v, xa, fa, False)
        db, _ = backbone.apply(v, xb, fb, False)
        return (
            jnp.sum(nn_correspondence(da, db))
            + jnp.sum(nn_correspondence(db, da))
        ).astype(jnp.float32)

    @jax.jit
    def fwd(v, xa, fa):
        da, _ = backbone.apply(v, xa, fa, False)
        return jnp.sum(da)

    @jax.jit
    def search(da, db):
        return jnp.sum(nn_correspondence(da, db))

    d0, _ = jax.jit(lambda v, x, f: backbone.apply(v, x, f, False))(
        variables, xyz0, f0
    )
    d1, _ = jax.jit(lambda v, x, f: backbone.apply(v, x, f, False))(
        variables, xyz1, f1
    )

    t_full = timeit(full, variables, xyz0, f0, xyz1, f1)
    t_fwd = timeit(fwd, variables, xyz0, f0)
    t_search = timeit(search, d0, d1)

    print(f"batch={BATCH} pairs, N={N}")
    print(f"full pipeline : {t_full:.4f} s/batch = {BATCH / t_full:7.1f} pairs/s")
    print(f"1x backbone   : {t_fwd:.4f} s/batch (x2 per pair)")
    print(f"1x nn search  : {t_search:.4f} s/batch (x2 per pair)")
    resid = t_full - 2 * t_fwd - 2 * t_search
    print(f"residual (overlap/dispatch): {resid:.4f} s/batch")


if __name__ == "__main__":
    main()
