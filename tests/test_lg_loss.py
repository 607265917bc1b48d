"""LG (DPC-style) loss tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.losses.lg_loss import LGLossConfig, lg_loss, neighbor_loss
from dvmatcher_tpu.ops.geometry import knn_idx


def _setup(rng, n1=32, n2=32):
    b, c = 2, 8
    feat1 = jnp.asarray(rng.normal(size=(b, n1, c)).astype(np.float32))
    feat2 = jnp.asarray(rng.normal(size=(b, n2, c)).astype(np.float32))
    verts1 = jnp.asarray(rng.normal(size=(b, n1, 3)).astype(np.float32))
    verts2 = jnp.asarray(rng.normal(size=(b, n2, 3)).astype(np.float32))
    mk = lambda v: jnp.asarray(
        np.linalg.norm(
            np.asarray(v)[:, :, None] - np.asarray(v)[:, None], axis=-1
        ).astype(np.float32)
    )
    return feat1, feat2, mk(verts1), mk(verts2), verts1, verts2


def test_perfect_reconstruction_zero_structural_terms(rng):
    feat1, feat2, d1, d2, v1, v2 = _setup(rng)
    cfg = LGLossConfig(w_dist=0.0, k_map=4, n_dist=8, k_dist=5)
    loss, aux = lg_loss(
        feat1, feat2, d1, d2, v1, v2, v1, v2, v1, v2,
        jax.random.PRNGKey(0), cfg,
    )
    # verts_corr == verts -> chamfer construct terms vanish; the neighbor
    # term is a smoothness prior (heat-weighted spread), nonzero by design
    np.testing.assert_allclose(float(aux["construct_loss"]), 0.0, atol=1e-5)
    assert float(aux["neighbor_loss"]) > 0


def test_full_loss_finite_and_positive(rng):
    feat1, feat2, d1, d2, v1, v2 = _setup(rng)
    cfg = LGLossConfig(k_map=4, n_dist=8, k_dist=5)
    noisy = v2 + 0.1
    loss, aux = lg_loss(
        feat1, feat2, d1, d2, v1, v2, noisy[:, : v1.shape[1]], v1, v1, v2,
        jax.random.PRNGKey(0), cfg,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_partial_branch_single_sided(rng):
    feat1, feat2, d1, d2, v1, v2 = _setup(rng, n1=32, n2=16)
    cfg = LGLossConfig(partial=True, k_map=4, n_dist=8, k_dist=5)
    loss, aux = lg_loss(
        feat1, feat2, d1, d2, v1, v2, v1, v2, v1, v2,
        jax.random.PRNGKey(0), cfg,
    )
    assert np.isfinite(float(loss))
    assert float(aux["map_loss"]) == 0.0  # no map/neighbor terms on partial


def test_neighbor_loss_penalises_scrambled(rng):
    v = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    idx = knn_idx(v, v, 6)
    perm = jnp.asarray(rng.permutation(40))
    good = float(neighbor_loss(v, idx, v, 6))
    bad = float(neighbor_loss(v, idx, v[:, perm], 6))
    assert bad > good
