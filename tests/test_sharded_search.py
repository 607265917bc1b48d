"""Sequence-parallel sharded ops vs single-device oracles on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.match import nn_correspondence, soft_correspondence, soft_project
from dvmatcher_tpu.parallel import make_mesh
from dvmatcher_tpu.parallel.sharded_search import (
    sharded_nn_correspondence,
    sharded_soft_project,
)


def test_sharded_nn_matches_dense(rng):
    mesh = make_mesh()
    fa = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    got = np.asarray(sharded_nn_correspondence(fa, fb, mesh))
    want = np.asarray(nn_correspondence(fa[None], fb[None]))[0]
    np.testing.assert_array_equal(got, want)


def test_sharded_soft_project_matches_dense(rng):
    mesh = make_mesh()
    fa = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    vb = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    got = np.asarray(sharded_soft_project(fa, fb, vb, 30.0, mesh))
    pi = soft_correspondence(fa[None], fb[None], 30.0)
    want = np.asarray(soft_project(pi, vb[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_nn_search_padded_matches_xla():
    """Padded-bucket wrapper (the cli/test --shard-points path): padded
    target rows never win the argmin; result == dense masked argmin."""
    from dvmatcher_tpu.ops.geometry import sq_dist, masked_argmin
    from dvmatcher_tpu.parallel import make_mesh
    from dvmatcher_tpu.parallel.sharded_search import sharded_nn_search_padded

    mesh = make_mesh()
    n_dev = len(jax.devices())
    n, m_valid, c = 40, 3 * n_dev * 8 - 5, 16
    m_pad = 3 * n_dev * 8
    fa = jax.random.normal(jax.random.PRNGKey(0), (n, c))
    fb = jax.random.normal(jax.random.PRNGKey(1), (m_pad, c))
    got = sharded_nn_search_padded(fa, fb, m_valid, mesh)
    _, want = masked_argmin(sq_dist(fa, fb[:m_valid]))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
