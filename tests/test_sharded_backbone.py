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


def test_sharded_backbone_rejects_indivisible():
    mesh = make_mesh()
    xyz, feats = _mk(None, n=30)
    with pytest.raises(ValueError, match="not divisible"):
        sharded_backbone_apply({}, xyz, feats, mesh, k=4)
