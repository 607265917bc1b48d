"""Deformation-graph parity tests against a numpy/scipy oracle that
replicates reference lib/deformation_graph_point.py:177-261 exactly."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import KDTree

from dvmatcher_tpu.deform import build_graph, skin, build_graph_batch, skin_batch
from dvmatcher_tpu.ops import rotation_6d_to_matrix


def _oracle_graph(verts, start=0, k=3, ring=9, sigma_scale=20.0):
    """Replicates construct_graph_euclidean with geod = euclidean cdist."""
    n = verts.shape[0]
    m = n // 2
    # FPS (models/model.py:48-63) with fixed start
    centroids = np.zeros(m, np.int64)
    distance = np.full(n, 1e10, np.float64)
    farthest = start
    for i in range(m):
        centroids[i] = farthest
        d = ((verts - verts[farthest]) ** 2).sum(-1)
        distance = np.minimum(distance, d)
        farthest = int(distance.argmax())
    nodes_idx = centroids
    nodes = verts[nodes_idx]
    _, one_ring = KDTree(nodes).query(nodes, ring)
    geod = np.linalg.norm(verts[:, None] - verts[None], axis=-1)
    geod_mat = geod[nodes_idx].T  # (N, M)
    infl_idx = np.argsort(geod_mat, axis=-1, kind="stable")[:, :k]
    dists = np.take_along_axis(geod_mat, infl_idx, axis=-1)
    d2, _ = KDTree(verts).query(verts, 2)
    sigma = sigma_scale * d2[:, 1].mean()
    w = np.exp(-(dists**2) / (2 * sigma * sigma))
    w = w / w.sum(-1, keepdims=True)
    return nodes_idx, one_ring, infl_idx, w


def _oracle_skin(verts, nodes_idx, one_ring, infl_idx, w, R, T):
    """Replicates DeformationGraph_geod.forward (lines 233-261)."""
    g = verts[nodes_idx]
    gv = g[infl_idx]  # (N,K,3)
    rv = R[infl_idx]
    tv = T[infl_idx]
    local = verts[:, None] - gv
    warped = (np.einsum("nkij,nkj->nki", rv, local) + gv + tv) * w[..., None]
    warped = warped.sum(1)
    gi, ti = g[:, None], T[:, None]
    gj, tj = g[one_ring], T[one_ring]
    diff = (gi + ti) - (gj + tj) - np.einsum("mij,mrj->mri", R, gi - gj)
    arap = (diff**2).sum() / nodes_idx.shape[0]
    sr = ((R[:, None] - R[one_ring]) ** 2).mean()
    return warped, arap, sr


def test_graph_build_matches_oracle(rng):
    verts = rng.normal(size=(64, 3)).astype(np.float32)
    g = jax.jit(lambda v: build_graph(v, start=0))(jnp.asarray(verts))
    ni, oring, infl, w = _oracle_graph(verts.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(g.nodes_idx), ni)
    # one-ring: compare distances not indices (KDTree tie order may differ)
    nodes = verts[ni]
    d_or = np.linalg.norm(nodes[:, None] - nodes[None], axis=-1)
    np.testing.assert_allclose(
        np.take_along_axis(d_or, np.asarray(g.one_ring), -1),
        np.take_along_axis(d_or, oring, -1),
        atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(g.infl_idx), infl)
    np.testing.assert_allclose(np.asarray(g.weights), w, rtol=2e-4, atol=1e-6)


def test_skin_matches_oracle(rng, key):
    verts = rng.normal(size=(64, 3)).astype(np.float32)
    g = build_graph(jnp.asarray(verts), start=0)
    m = 32
    d6 = jnp.array([1.0, 0, 0, 0, 1.0, 0]) + 0.1 * jax.random.normal(key, (m, 6))
    R = rotation_6d_to_matrix(d6)
    T = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (m, 3))
    warped, arap, sr = jax.jit(skin)(jnp.asarray(verts), g, R, T)
    w_or, a_or, s_or = _oracle_skin(
        verts.astype(np.float64),
        np.asarray(g.nodes_idx),
        np.asarray(g.one_ring),
        np.asarray(g.infl_idx),
        np.asarray(g.weights).astype(np.float64),
        np.asarray(R).astype(np.float64),
        np.asarray(T).astype(np.float64),
    )
    np.testing.assert_allclose(np.asarray(warped), w_or, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(arap), a_or, rtol=1e-4)
    np.testing.assert_allclose(float(sr), s_or, rtol=1e-4)


def test_identity_transform_is_noop(rng):
    verts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    g = build_graph(verts, start=0)
    m = 25
    R = jnp.tile(jnp.eye(3), (m, 1, 1))
    T = jnp.zeros((m, 3))
    warped, arap, sr = skin(verts, g, R, T)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(verts), atol=1e-5)
    assert float(arap) < 1e-10 and float(sr) < 1e-10


def test_rigid_motion_zero_arap(rng):
    verts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    g = build_graph(verts, start=0)
    m = 25
    Rg = np.asarray(rotation_6d_to_matrix(jnp.array([0.5, 0.5, 0, 0, 1.0, 0.3])))
    t = np.array([0.3, -0.2, 0.1], np.float32)
    # same rigid transform at every node: v' = R(v-g)+g+t_g with t_g chosen so
    # the global map is v -> Rv + t:  t_g = R g - g + t
    gpts = np.asarray(verts)[np.asarray(g.nodes_idx)]
    T = gpts @ Rg.T - gpts + t
    R = jnp.tile(jnp.asarray(Rg), (m, 1, 1))
    warped, arap, sr = skin(verts, g, R, jnp.asarray(T))
    want = np.asarray(verts) @ Rg.T + t
    np.testing.assert_allclose(np.asarray(warped), want, atol=1e-5)
    assert float(arap) < 1e-8


def test_batched_build_and_skin(rng):
    verts = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
    g = build_graph_batch(verts)
    assert g.nodes_idx.shape == (2, 20)
    R = jnp.tile(jnp.eye(3), (2, 20, 1, 1))
    T = jnp.zeros((2, 20, 3))
    warped, arap, sr = skin_batch(verts, g, R, T)
    assert warped.shape == (2, 40, 3)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(verts), atol=1e-5)


def test_graph_gradients_blocked(rng):
    """Graph build is under stop_gradient (reference builds from detached
    verts on CPU); warp gradients flow only through the skinning math."""
    verts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))

    def f(v):
        g = build_graph(v, start=0)
        m = 15
        R = jnp.tile(jnp.eye(3), (m, 1, 1))
        T = jnp.ones((m, 3)) * 0.1
        warped, arap, _ = skin(v, g, R, T)
        return jnp.sum(warped**2) + arap

    grads = jax.grad(f)(verts)
    assert np.all(np.isfinite(np.asarray(grads)))
    assert float(jnp.abs(grads).sum()) > 0
