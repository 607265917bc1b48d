"""Point-axis sharded backbone forward — embed clouds bigger than one chip.

The reference backbone tops out where its N x N materialisations exhaust
one GPU's HBM (SA energies models/model.py:117, full-cdist kNN graphs
models/model.py:267-278 — SURVEY.md section 2c names the N axis as the
scale-up dimension). This wrapper runs the full Uni3FC forward under
`shard_map` with the point dimension sharded across the ICI mesh:

  * per-point layers (dense/BN) run on local slabs untouched;
  * attention layers use the collectives in parallel/sharded_attention.py
    (all_gather of O(N*C) key/value tensors, psum_scatter of the
    offset-attention column reductions);
  * the positional-encoding min/max and the global max-pool reduce with
    pmin/pmax across devices.

Parameters are replicated; activations and every O(N^2)-derived block are
sharded — per-device attention memory is N^2/D, so the reachable cloud
size scales linearly with the mesh. Inference-only (BatchNorm running
stats); numerically validated against the single-device forward in
tests/test_sharded_backbone.py and exercised by the driver's multi-chip
dry run (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def sharded_backbone_apply(
    variables,
    xyz: jax.Array,  # (B, N, 3), N divisible by the mesh size
    feats: jax.Array | None,  # (B, N, feat_dim) or None
    mesh: Mesh,
    axis: str = "data",
    **backbone_kw,
):
    """Full-backbone forward with the point axis sharded over `mesh`.

    `variables` are the ordinary (single-device) Uni3FC variables —
    `shard_axis` is a module hyperparameter, not a parameter, so the same
    weights serve the dense, fused-kernel, and sharded forwards. Returns
    (descriptors (B, N, out), cfeats (B, N, 64)) laid out sharded over
    the point axis.
    """
    from dvmatcher_tpu.models import Uni3FC

    n = xyz.shape[1]
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(f"point count {n} not divisible by mesh size {n_dev}")

    backbone = Uni3FC(shard_axis=axis, **backbone_kw)
    pt = P(None, axis)

    if feats is None:

        @jax.jit
        def run(vars_, xyz_):
            fwd = shard_map(
                lambda v_, x_: backbone.apply(v_, x_, None, False),
                mesh=mesh,
                in_specs=(P(), pt),
                out_specs=(pt, pt),
                check_vma=False,
            )
            return fwd(vars_, xyz_)

        xyz = jax.device_put(xyz, NamedSharding(mesh, pt))
        return run(variables, xyz)

    @jax.jit
    def run(vars_, xyz_, feats_):
        fwd = shard_map(
            lambda v_, x_, f_: backbone.apply(v_, x_, f_, False),
            mesh=mesh,
            in_specs=(P(), pt, pt),
            out_specs=(pt, pt),
            check_vma=False,
        )
        return fwd(vars_, xyz_, feats_)

    sh = NamedSharding(mesh, pt)
    return run(variables, jax.device_put(xyz, sh), jax.device_put(feats, sh))
