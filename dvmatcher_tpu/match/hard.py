"""Hard nearest-neighbor correspondence search (inference path).

Parity: reference test.py:19-28 — `T12 = argmin_j cdist(feat1, feat2)` with
+1 for the 1-indexed MATLAB protocol. We return 0-indexed maps; the CLI
writer adds the +1 when emitting the `T_*.txt` protocol files.

On TPU the search runs through the fused streaming kernel
(ops/pallas/pi_search.nn_argmin): the N×M distance matrix never reaches
HBM (the XLA path writes ~100 MB per 5k-point pair and reads it back for
the argmin). Elsewhere (CPU tests) the XLA path runs.
"""

from __future__ import annotations

import jax

from dvmatcher_tpu.ops.geometry import sq_dist, masked_argmin


def nn_correspondence(
    feat_a: jax.Array,
    feat_b: jax.Array,
    mask_b: jax.Array | None = None,
    *,
    impl: str | None = None,  # "pallas" | "xla" | None = auto
) -> jax.Array:
    """For each row of feat_a (..., N, C): index of nearest row of feat_b."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and feat_a.ndim == 3:
        from dvmatcher_tpu.ops.pallas.pi_search import nn_argmin

        _, idx = nn_argmin(feat_a, feat_b, mask_b)
        return idx
    d = sq_dist(feat_a, feat_b)
    _, idx = masked_argmin(d, mask_b)
    return idx
