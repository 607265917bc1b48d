"""Measure the TRUE train-step time on the current device.

Usage: python tools/probe_train_step.py on|off [n_iters]

`on` = fused Pallas attention kernels (fast compensated-bf16 mode),
`off` = the XLA saved-activation path. Forces a scalar readback per step —
on the axon remote TPU `block_until_ready` returns immediately, so naive
timing loops measure dispatch, not compute (verify-skill gotcha).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    use_kernel = sys.argv[1] == "on"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.losses import LossConfig
    from dvmatcher_tpu.train import create_train_state, make_train_step

    b, n = 2, 4995
    cfg = LossConfig()
    state, backbone, deformer, tx = create_train_state(
        jax.random.PRNGKey(0), n_points=n, feat_dim=None, k_backbone=40,
        k_deform=cfg.k_deform, lr=2e-3, b1=0.9, b2=0.99,
        use_kernel=use_kernel,
    )
    step = make_train_step(backbone, deformer, tx, cfg)

    rng = np.random.default_rng(0)

    def side():
        return {
            "xyz": jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32),
            "mask": jnp.ones((b, n), bool),
            "dist": jnp.asarray(rng.random((b, n, n)), jnp.bfloat16),
        }

    batch = {
        "shape1": side(),
        "shape2": side(),
        "anchors1": jnp.asarray(rng.choice(n, 1000, replace=False), jnp.int32),
        "anchors2": jnp.asarray(rng.choice(n, 1000, replace=False), jnp.int32),
    }
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, m = step(state, batch, 50.0, key)
    _ = float(m["loss"])  # forces completion
    print(f"compile+first: {time.time() - t0:.1f}s")

    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, batch, 50.0, key)
        last = float(m["loss"])  # per-step readback = honest timing
    dt = (time.time() - t0) / iters
    print(f"use_kernel={use_kernel}: {dt * 1000:.0f} ms/step (loss {last:.3f})")


if __name__ == "__main__":
    main()
