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
    pmin/pmax across devices;
  * padded-bucket masks are supported (sharded like the points; neighbor
    selection gathers the full mask), so the static-bucket inference
    pipeline (cli/test.py) can shard its forwards unchanged.

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


def sharded_forward(
    module,
    mesh: Mesh,
    axis: str = "data",
    with_feats: bool = False,
    with_mask: bool = False,
    batch_axis: str | None = None,
):
    """Build a jitted point-axis-sharded forward for an existing backbone.

    `module` is any Uni3FC instance (its `shard_axis` is overridden — the
    field is a hyperparameter, not a parameter, so the ordinary
    single-device variables apply unchanged). Returns
    `fwd(variables, xyz, feats=None, mask=None) -> (desc, cfeats)` with
    all point-axis arrays laid out sharded over `mesh`. Compiled once;
    reuse across shapes of one bucket.

    `batch_axis` names a second mesh axis to shard the batch dimension
    over (a 2-D dp x sp mesh: pairs spread along `batch_axis`, each
    pair's points spread along `axis`; the point-axis collectives stay
    within their dp row of the mesh).
    """
    backbone = module.clone(shard_axis=axis, batch_shard_axis=batch_axis)
    pt = P(batch_axis, axis)
    n_dev = mesh.shape[axis]
    specs = [pt] * (1 + int(with_feats) + int(with_mask))

    def inner(v_, *arrs):
        it = iter(arrs)
        x_ = next(it)
        f_ = next(it) if with_feats else None
        m_ = next(it) if with_mask else None
        return backbone.apply(v_, x_, f_, False, m_)

    jitted = jax.jit(
        shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), *specs),
            out_specs=(pt, pt),
            check_vma=False,
        )
    )
    sh = NamedSharding(mesh, pt)

    def fwd(variables, xyz, feats=None, mask=None):
        n = xyz.shape[1]
        if n % n_dev:
            raise ValueError(
                f"point count {n} not divisible by mesh size {n_dev}"
            )
        if batch_axis is not None and xyz.shape[0] % mesh.shape[batch_axis]:
            raise ValueError(
                f"batch {xyz.shape[0]} not divisible by mesh axis "
                f"'{batch_axis}' ({mesh.shape[batch_axis]})"
            )
        if (feats is not None) != with_feats or (mask is not None) != with_mask:
            raise ValueError("feats/mask presence must match construction")
        args = [jax.device_put(xyz, sh)]
        if with_feats:
            args.append(jax.device_put(feats, sh))
        if with_mask:
            args.append(jax.device_put(mask, sh))
        return jitted(variables, *args)

    return fwd


def sharded_backbone_apply(
    variables,
    xyz: jax.Array,  # (B, N, 3), N divisible by the mesh size
    feats: jax.Array | None,  # (B, N, feat_dim) or None
    mesh: Mesh,
    axis: str = "data",
    mask: jax.Array | None = None,  # (B, N) padded-point mask or None
    **backbone_kw,
):
    """One-shot convenience wrapper around `sharded_forward`.

    Builds a fresh Uni3FC from `backbone_kw`; returns
    (descriptors (B, N, out), cfeats (B, N, 64)) sharded over the point
    axis. For repeated calls (the inference loop) build `sharded_forward`
    once instead — this wrapper re-jits per call.
    """
    from dvmatcher_tpu.models import Uni3FC

    fwd = sharded_forward(
        Uni3FC(**backbone_kw),
        mesh,
        axis,
        with_feats=feats is not None,
        with_mask=mask is not None,
    )
    return fwd(variables, xyz, feats, mask)
