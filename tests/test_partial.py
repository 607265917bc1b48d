"""Partial-view pipeline tests: view generation on a real SCAPE mesh
(read-only reference fixture) + the partial pair dataset end to end."""

import numpy as np
import pytest

from dvmatcher_tpu.data import read_off
from dvmatcher_tpu.data.dataset import ShapeRecord, fps_numpy
from dvmatcher_tpu.data.partial import PartialPairDataset
from dvmatcher_tpu.data.views import (
    compute_vertex_normals,
    icosahedron_rotations,
    partial_view_indices,
    read_view_indices,
    write_view_indices,
)

SCAPE = "/root/reference/data/scape_r"


def test_icosahedron_rotations():
    rots = icosahedron_rotations()
    assert len(rots) == 12


def test_vertex_normals_unit_sphereish():
    # icosahedron mesh: normals should point outward ~ vertex directions
    from dvmatcher_tpu.data.views import icosahedron_vertices

    verts = icosahedron_vertices()
    verts = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    # build faces via convex hull
    from scipy.spatial import ConvexHull

    faces = ConvexHull(verts).simplices
    # fix winding so normals point outward
    c = verts.mean(0)
    fixed = []
    for f in faces:
        n = np.cross(verts[f[1]] - verts[f[0]], verts[f[2]] - verts[f[0]])
        fixed.append(f if np.dot(n, verts[f].mean(0) - c) > 0 else f[::-1])
    normals = compute_vertex_normals(verts, np.asarray(fixed))
    cos = (normals * verts).sum(-1)
    assert cos.min() > 0.9


@pytest.fixture(scope="module")
def scape_views(tmp_path_factory):
    verts, faces = read_off(f"{SCAPE}/shapes_test/mesh052.off")
    views = partial_view_indices(verts.astype(np.float64), faces)
    d = tmp_path_factory.mktemp("views")
    write_view_indices(str(d), "mesh052", views)
    return verts, views, d


def test_partial_views_cover_mesh(scape_views):
    verts, views, d = scape_views
    assert len(views) == 12
    sizes = [len(v) for v in views]
    # each view keeps roughly half the surface
    assert all(1000 < s < 4500 for s in sizes), sizes
    covered = np.unique(np.concatenate(views))
    assert covered.shape[0] > 0.99 * verts.shape[0]
    # roundtrip through the reference txt format
    idx = read_view_indices(str(d), "mesh052", 1)
    np.testing.assert_array_equal(idx, views[0])


def test_partial_pair_dataset(scape_views):
    verts, views, d = scape_views
    n = verts.shape[0]
    fps = fps_numpy(verts, 4995)
    dist = np.linalg.norm(
        verts[:, None, :2] - verts[None, :, :2], axis=-1
    ).astype(np.float32)  # cheap stand-in with full-vertex shape
    rec = ShapeRecord("mesh052", verts, fps, dist, None)
    ds = PartialPairDataset([rec, rec], str(d), mode="train", seed=0)
    item = ds.get(0)
    assert item["shape1"]["xyz"].shape == (4995, 3)
    assert item["shape2"]["xyz"].shape == (2200, 3)
    assert item["shape2"]["dist"].shape == (2200, 2200)
    batch = next(iter(ds.batches(2, shuffle=True, seed=1)))
    assert batch["shape2"]["xyz"].shape == (2, 2200, 3)


def test_partial_test_combinations(scape_views):
    verts, views, d = scape_views
    rec = ShapeRecord("mesh052", verts, fps_numpy(verts, 4995), None, None)
    ds = PartialPairDataset([rec, rec, rec], str(d), mode="test")
    assert ds.combinations == [(0, 1), (0, 2)]
