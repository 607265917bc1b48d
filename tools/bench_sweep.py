"""Batch-size sweep of the headline inference bench (bench.py protocol).

Finds the throughput-optimal BATCH_PAIRS for the SCAPE_r correspondence
pipeline on the attached TPU; bench.py's constant should track the winner.
Prints one line per batch size plus a BEST line.
"""

from __future__ import annotations

import time

import numpy as np


def measure(batch_pairs: int, n_bench_pairs: int = 64) -> float:
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.data import read_off
    from dvmatcher_tpu.data.dataset import fps_numpy
    from dvmatcher_tpu.match import nn_correspondence
    from dvmatcher_tpu.models import Uni3FC

    n_points = 4995
    shapes = []
    for name in ("mesh052", "mesh053"):
        verts, _ = read_off(f"/root/reference/data/scape_r/shapes_test/{name}.off")
        fps = fps_numpy(verts, n_points)
        shapes.append(verts[fps])

    backbone = Uni3FC(k=40, use_kernel=True)
    xyz0 = jnp.asarray(np.stack([shapes[0]] * batch_pairs))
    xyz1 = jnp.asarray(np.stack([shapes[1]] * batch_pairs))
    key = jax.random.PRNGKey(0)
    feats0 = jax.random.normal(key, (1, n_points, 1152))
    variables = backbone.init(jax.random.PRNGKey(2), xyz0[:1], feats0, False)

    n_batches = max(1, n_bench_pairs // batch_pairs)

    def pair_step(variables, xyz_a, feats_a, xyz_b, feats_b):
        da, _ = backbone.apply(variables, xyz_a, feats_a, False)
        db, _ = backbone.apply(variables, xyz_b, feats_b, False)
        return jnp.sum(nn_correspondence(da, db)) + jnp.sum(
            nn_correspondence(db, da)
        )

    @jax.jit
    def run(variables, xyz_a, xyz_b, key):
        def step(carry, i):
            kk = jax.random.fold_in(key, i)
            fa = jax.random.normal(kk, (batch_pairs, n_points, 1152))
            fb = jax.random.normal(
                jax.random.fold_in(kk, 1), (batch_pairs, n_points, 1152)
            )
            return carry + pair_step(variables, xyz_a, fa, xyz_b, fb), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(n_batches))
        return total

    float(run(variables, xyz0, xyz1, key))  # compile
    t0 = time.perf_counter()
    float(run(variables, xyz0, xyz1, key))
    dt = time.perf_counter() - t0
    return (n_batches * batch_pairs) / dt


def main() -> None:
    best = (0.0, 0)
    for bp in (8, 16, 24, 32, 48, 64):
        try:
            pps = measure(bp)
        except Exception as e:  # OOM at large batch: report and move on
            print(f"batch {bp:3d}: failed ({type(e).__name__})", flush=True)
            continue
        print(f"batch {bp:3d}: {pps:.2f} pairs/s", flush=True)
        if pps > best[0]:
            best = (pps, bp)
    print(f"BEST batch {best[1]} -> {best[0]:.2f} pairs/s")


if __name__ == "__main__":
    main()
