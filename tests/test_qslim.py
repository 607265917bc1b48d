"""qslim decimation + mesh-mode deformation graph tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvmatcher_tpu.data import read_off
from dvmatcher_tpu.data.geodesics import mesh_geodesics
from dvmatcher_tpu.deform import skin
from dvmatcher_tpu.deform.qslim import build_graph_mesh, qslim_decimate, vertex_quadrics


def _sphere(n_sub=2):
    """Icosphere via scipy ConvexHull on subdivided icosahedron."""
    from dvmatcher_tpu.data.views import icosahedron_vertices
    from scipy.spatial import ConvexHull

    v = icosahedron_vertices()
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    for _ in range(n_sub):
        hull = ConvexHull(v)
        mids = v[hull.simplices].mean(1)
        v = np.concatenate([v, mids / np.linalg.norm(mids, axis=-1, keepdims=True)])
        v = np.unique(np.round(v, 9), axis=0)
    hull = ConvexHull(v)
    return v, hull.simplices.astype(np.int32)


def test_vertex_quadrics_planar_points_zero_cost():
    # a flat square: plane quadric evaluated on in-plane points is ~0
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    q = vertex_quadrics(verts, faces)
    hom = np.concatenate([verts, np.ones((4, 1))], 1)
    costs = np.einsum("ni,nij,nj->n", hom, q, hom)
    np.testing.assert_allclose(costs, 0.0, atol=1e-12)


def test_qslim_halves_vertices():
    v, f = _sphere(2)
    n = v.shape[0]
    new_faces, d = qslim_decimate(v, f, 0.5)
    kept = d.tocoo().col
    n_kept = len(kept)
    assert n_kept <= int(np.ceil(n * 0.5)) + 2
    assert new_faces.max() < n_kept
    # D maps original verts to coarse order
    coarse = d @ v
    np.testing.assert_allclose(coarse, v[kept])
    # coarse mesh still covers the sphere (radii ~ 1)
    np.testing.assert_allclose(np.linalg.norm(coarse, axis=-1), 1.0, atol=0.05)


def test_mesh_graph_and_skinning():
    verts, faces = _sphere(2)
    n = verts.shape[0]
    geod = mesh_geodesics(verts, faces)
    g = build_graph_mesh(verts, faces, geod)
    m = g.nodes_idx.shape[0]
    assert 0.35 * n < m < 0.65 * n
    assert g.one_ring.shape == (m, 18)
    np.testing.assert_allclose(np.asarray(g.weights).sum(-1), 1.0, rtol=1e-5)
    # identity transform leaves verts in place with zero arap
    warped, arap, sr = skin(
        jnp.asarray(verts), g, jnp.tile(jnp.eye(3), (m, 1, 1)), jnp.zeros((m, 3))
    )
    np.testing.assert_allclose(np.asarray(warped), verts, atol=1e-4)
    assert float(arap) < 1e-8
