"""Data-layer tests on real reference fixtures (read-only) + synthetic."""

import numpy as np
import pytest

from dvmatcher_tpu.data import (
    PairDataset,
    ShapeRecord,
    knn_graph_geodesics,
    mesh_geodesics,
    read_off,
)
from dvmatcher_tpu.data.dataset import fps_numpy, preprocess_split, load_split
from dvmatcher_tpu.data.off_io import write_off_points

SCAPE = "/root/reference/data/scape_r"


def test_read_off_real_mesh():
    verts, faces = read_off(f"{SCAPE}/shapes_test/mesh052.off")
    assert verts.shape == (5000, 3)
    assert faces.shape == (9996, 3)
    assert faces.max() < 5000 and faces.min() >= 0


def test_off_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    p = tmp_path / "x.off"
    write_off_points(str(p), pts)
    got, faces = read_off(str(p))
    assert faces is None
    np.testing.assert_allclose(got, pts, rtol=1e-6)


def test_mesh_geodesics_triangle_strip():
    # 4 points on a line, connected by 2 triangles sharing edges
    verts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [0.5, 1, 0]], np.float64)
    faces = np.array([[0, 1, 3], [1, 2, 3]], np.int32)
    d = mesh_geodesics(verts, faces)
    assert d.shape == (4, 4)
    np.testing.assert_allclose(np.diag(d), 0)
    np.testing.assert_allclose(d, d.T)
    np.testing.assert_allclose(d[0, 2], 2.0, rtol=1e-6)  # via vertex 1


def test_knn_geodesics_circle():
    t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    verts = np.stack([np.cos(t), np.sin(t), 0 * t], -1)
    d = knn_graph_geodesics(verts, k=2)
    # opposite points: graph distance ~ half circumference (pi), not chord (2)
    assert abs(d[0, 30] - np.pi) < 0.1


def test_fps_numpy_matches_device(rng):
    import jax.numpy as jnp
    from dvmatcher_tpu.ops import farthest_point_sample

    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    h = fps_numpy(xyz, 30, start=0)
    d = np.asarray(farthest_point_sample(jnp.asarray(xyz), 30, start=0))
    np.testing.assert_array_equal(h, d)


@pytest.fixture(scope="module")
def tiny_cache(tmp_path_factory, ):
    """Synthetic 3-shape dataset preprocessed end to end."""
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("data")
    (root / "shapes_train").mkdir()
    for i in range(3):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        write_off_points(str(root / "shapes_train" / f"s{i}.off"), pts)
    cache = root / "cache"
    preprocess_split(
        str(root), "train", str(cache), n_points=40, knn_k=6, progress=False
    )
    return cache


def test_preprocess_and_load(tiny_cache):
    records = load_split(str(tiny_cache), "train")
    assert len(records) == 3
    r = records[0]
    assert r.verts.shape == (50, 3)
    assert r.fps.shape == (40,)
    assert r.dist.shape == (40, 40)
    np.testing.assert_allclose(np.diag(r.dist), 0, atol=1e-6)


def test_preprocess_idempotent(tiny_cache):
    # second run should be a no-op (done markers)
    records1 = load_split(str(tiny_cache), "train")
    v0 = np.asarray(records1[0].verts).copy()
    root = tiny_cache.parent
    preprocess_split(str(root), "train", str(tiny_cache), n_points=40, progress=False)
    records2 = load_split(str(tiny_cache), "train")
    np.testing.assert_array_equal(v0, np.asarray(records2[0].verts))


def test_pair_dataset_train_batches(tiny_cache):
    records = load_split(str(tiny_cache), "train")
    ds = PairDataset(records, mode="train")
    assert len(ds) == 6  # 3P2 ordered pairs
    batches = list(ds.batches(2, shuffle=True, seed=0))
    assert len(batches) == 3
    b = batches[0]
    assert b["shape1"]["xyz"].shape == (2, 40, 3)
    assert b["shape1"]["dist"].shape == (2, 40, 40)
    assert b["shape1"]["mask"].all()


def test_pair_dataset_test_padding(tiny_cache):
    records = load_split(str(tiny_cache), "train")
    # simulate ragged sizes by truncating one record's verts
    records[1] = ShapeRecord(
        records[1].name, records[1].verts[:30], records[1].fps[:20], None, None
    )
    ds = PairDataset(records, mode="test", bucket_multiple=16)
    item = ds.get(0)
    assert item["shape1"]["xyz"].shape[0] == ds.bucket
    assert ds.bucket % 16 == 0
    assert item["shape1"]["mask"].sum() == item["shape1"]["n"]


def test_heat_geodesics_flat_grid():
    """On a flat triangulated grid the geodesic distance is euclidean; the
    heat method must reproduce it to a few percent (its smoothing bias)."""
    from dvmatcher_tpu.data.geodesics import heat_geodesics_mesh

    m = 12
    xs, ys = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(m * m)], -1).astype(float)
    faces = []
    for i in range(m - 1):
        for j in range(m - 1):
            a, b, c, d = i * m + j, i * m + j + 1, (i + 1) * m + j, (i + 1) * m + j + 1
            faces += [[a, b, d], [a, d, c]]
    faces = np.asarray(faces)

    src = np.array([0, (m * m) // 2])
    d_heat = heat_geodesics_mesh(verts, faces, sources=src)
    d_true = np.linalg.norm(verts[None] - verts[src][:, None], axis=-1)
    mask = d_true > 2.0  # skip the near field where relative error blows up
    rel = np.abs(d_heat - d_true)[mask] / d_true[mask]
    assert rel.mean() < 0.05, rel.mean()
    assert rel.max() < 0.25, rel.max()
