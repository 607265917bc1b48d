"""Point-axis sharded backbone forward vs the single-device forward.

The sharded path (parallel/sharded_backbone.py) must be numerically a
relayout of the dense forward: every attention layer computes identical
math, only distributed (all_gather'd keys/values, psum_scatter'd offset-
attention reductions, pmin/pmax'd global statistics). Run on the virtual
8-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvmatcher_tpu.models import Uni3FC
from dvmatcher_tpu.parallel import make_mesh
from dvmatcher_tpu.parallel.sharded_backbone import sharded_backbone_apply


def _mk(feat_dim, n=64, b=1, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    feats = (
        None
        if feat_dim is None
        else jnp.asarray(rng.normal(size=(b, n, feat_dim)).astype(np.float32))
    )
    return xyz, feats


@pytest.mark.parametrize("feat_dim", [None, 24])
def test_sharded_backbone_matches_dense(feat_dim):
    mesh = make_mesh()
    xyz, feats = _mk(feat_dim)
    kw = dict(k=6, emb_dims=32, out=16, feat_dim=feat_dim or 1152)

    dense = Uni3FC(**kw)
    variables = dense.init(jax.random.PRNGKey(0), xyz, feats, False)
    want_desc, want_cf = dense.apply(variables, xyz, feats, False)

    got_desc, got_cf = sharded_backbone_apply(
        variables, xyz, feats, mesh, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got_desc), np.asarray(want_desc), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_cf), np.asarray(want_cf), rtol=2e-4, atol=2e-5
    )


def test_sharded_backbone_batch_two():
    mesh = make_mesh()
    xyz, feats = _mk(None, n=40, b=2, seed=1)
    kw = dict(k=5, emb_dims=16, out=8)
    dense = Uni3FC(**kw)
    variables = dense.init(jax.random.PRNGKey(1), xyz, feats, False)
    want_desc, _ = dense.apply(variables, xyz, feats, False)
    got_desc, _ = sharded_backbone_apply(variables, xyz, feats, mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(got_desc), np.asarray(want_desc), rtol=2e-4, atol=2e-5
    )


def test_sharded_backbone_masked_matches_dense():
    """Padded-bucket path (cli/test --shard-points): mask sharded with the
    points; valid rows equal the dense masked forward."""
    mesh = make_mesh()
    n, n_valid = 64, 49
    xyz, _ = _mk(None, n=n, seed=2)
    mask = jnp.arange(n)[None] < n_valid
    xyz = jnp.where(mask[..., None], xyz, 0.0)
    kw = dict(k=6, emb_dims=32, out=16)

    dense = Uni3FC(**kw)
    variables = dense.init(jax.random.PRNGKey(2), xyz, None, False, mask)
    want_desc, _ = dense.apply(variables, xyz, None, False, mask)
    got_desc, _ = sharded_backbone_apply(
        variables, xyz, None, mesh, mask=mask, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got_desc)[:, :n_valid],
        np.asarray(want_desc)[:, :n_valid],
        rtol=2e-4,
        atol=2e-5,
    )


def test_sharded_forward_reuses_compilation():
    """`sharded_forward` is the loop-friendly API: one build, many shapes."""
    from dvmatcher_tpu.parallel.sharded_backbone import sharded_forward

    mesh = make_mesh()
    kw = dict(k=4, emb_dims=16, out=8)
    xyz, _ = _mk(None, n=32, seed=3)
    dense = Uni3FC(**kw)
    variables = dense.init(jax.random.PRNGKey(3), xyz, None, False)
    fwd = sharded_forward(dense, mesh)
    want, _ = dense.apply(variables, xyz, None, False)
    for seed in (3, 4):
        x2, _ = _mk(None, n=32, seed=seed)
        got, _ = fwd(variables, x2)
        ref, _ = dense.apply(variables, x2, None, False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
        )


def test_sharded_backbone_rejects_indivisible():
    mesh = make_mesh()
    xyz, feats = _mk(None, n=30)
    with pytest.raises(ValueError, match="not divisible"):
        sharded_backbone_apply({}, xyz, feats, mesh, k=4)


def test_sharded_backbone_grad_matches_dense():
    """The sharded forward is differentiable: all_gather/psum_scatter
    transpose to psum_scatter/all_gather, so parameter gradients through
    the sharded graph equal the dense ones (eval-mode BN; enables
    point-sharded fine-tuning/registration at scale)."""
    mesh = make_mesh()
    xyz, _ = _mk(None, n=32, seed=5)
    kw = dict(k=4, emb_dims=16, out=8)
    dense = Uni3FC(**kw)
    variables = dense.init(jax.random.PRNGKey(5), xyz, None, False)
    params, rest = variables["params"], {
        k: v for k, v in variables.items() if k != "params"
    }

    def dense_loss(p):
        desc, _ = dense.apply({"params": p, **rest}, xyz, None, False)
        return jnp.sum(desc**2)

    def shard_loss(p):
        desc, _ = sharded_backbone_apply(
            {"params": p, **rest}, xyz, None, mesh, **kw
        )
        return jnp.sum(desc**2)

    from jax.flatten_util import ravel_pytree

    g_dense = jax.grad(dense_loss)(params)
    g_shard = jax.grad(shard_loss)(params)
    flat_d, _ = ravel_pytree(g_dense)
    flat_s, _ = ravel_pytree(g_shard)
    np.testing.assert_allclose(
        np.asarray(flat_s), np.asarray(flat_d), rtol=5e-3, atol=1e-4
    )


def test_sharded_backbone_kernel_path_matches_dense_kernel():
    """use_kernel=True under sharding: every device runs the fused cross
    kernels (knn_attention_cross / sa_attention_cross_partials) on its
    slab; output matches the single-device fused-kernel forward."""
    mesh = make_mesh()
    xyz, _ = _mk(None, n=64, seed=7)
    kw = dict(k=6, emb_dims=32, out=16, use_kernel=True)
    dense = Uni3FC(**kw)
    variables = dense.init(jax.random.PRNGKey(7), xyz, None, False)
    want_desc, _ = dense.apply(variables, xyz, None, False)
    got_desc, _ = sharded_backbone_apply(variables, xyz, None, mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(got_desc), np.asarray(want_desc), rtol=5e-3, atol=1e-3
    )


def test_sharded_backbone_2d_mesh_dp_x_sp():
    """2-D mesh: pairs sharded over 'data', each pair's points over
    'points' — the full dp x sp layout. Point-axis collectives stay
    within their dp row; only the global pos-encoding min/max spans both
    axes. Output equals the dense forward."""
    from jax.sharding import Mesh

    from dvmatcher_tpu.parallel.sharded_backbone import sharded_forward

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "points"))
    xyz, _ = _mk(None, n=32, b=2, seed=9)
    kw = dict(k=4, emb_dims=16, out=8)
    dense = Uni3FC(**kw)
    variables = dense.init(jax.random.PRNGKey(9), xyz, None, False)
    want, _ = dense.apply(variables, xyz, None, False)
    fwd = sharded_forward(dense, mesh, axis="points", batch_axis="data")
    got, _ = fwd(variables, xyz)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
