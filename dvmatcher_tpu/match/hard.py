"""Hard nearest-neighbor correspondence search (inference path).

Parity: reference test.py:19-28 — `T12 = argmin_j cdist(feat1, feat2)` with
+1 for the 1-indexed MATLAB protocol. We return 0-indexed maps; the CLI
writer adds the +1 when emitting the `T_*.txt` protocol files.
"""

from __future__ import annotations

import jax

from dvmatcher_tpu.ops.geometry import sq_dist, masked_argmin


def nn_correspondence(
    feat_a: jax.Array,
    feat_b: jax.Array,
    mask_b: jax.Array | None = None,
) -> jax.Array:
    """For each row of feat_a (..., N, C): index of nearest row of feat_b."""
    d = sq_dist(feat_a, feat_b)
    _, idx = masked_argmin(d, mask_b)
    return idx
