"""Device mesh + sharding helpers.

The reference is strictly single-GPU (train.py:30-33; no torch.distributed
anywhere — SURVEY.md section 2c). The natural TPU parallelism for this
workload is data parallelism over the shape-pair batch axis on the ICI
mesh: parameters replicated, batches split, gradients all-reduced by XLA.
Everything here is plain `jax.sharding` — no custom collectives; XLA
inserts psums over ICI from the shardings.

The N-axis (points) is the scale-up dimension for clouds beyond HBM-N^2
limits; the flash-style streaming kernels in ops.pallas (`pi_matmul`,
`nn_argmin`, the fused attentions) are the single-device analog, and
sharding N over the mesh (parallel/sharded_search.py) is the multi-chip
extension.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard the per-pair arrays over their leading (batch) axis.

    Only the leaves inside the "shape1"/"shape2" sub-dicts are batch-major;
    top-level extras (e.g. the shared dist-loss anchor indices) are
    replicated."""
    sh = data_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    out = {}
    for k, v in batch.items():
        if k.startswith("shape") and isinstance(v, dict):
            out[k] = {kk: put(vv, sh) for kk, vv in v.items()}
        else:
            out[k] = put(v, rep)
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
