"""WKS anchor-feature path (the intrinsic stand-in for the reference's
frozen DINO features, reference train.py:72 / dataset.py:159-194):
descriptor invariances, point-cloud Laplacian fallback, per-artifact
preprocess backfill, and the feat_dim-configurable backbone."""

import numpy as np
import pytest

from tests.test_spectral import _octa_sphere

from dvmatcher_tpu.spectral.wks import wks_descriptors


def _rot():
    a, b = 0.7, -1.1
    rz = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    )
    rx = np.array(
        [[1, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]]
    )
    return rz @ rx


def _bumpy_sphere(subdiv=2, seed=3):
    """Sphere with smooth random radial bumps — breaks the sphere's
    degenerate spectrum so eigenspace truncation is well-defined."""
    verts, faces = _octa_sphere(subdiv)
    rng = np.random.default_rng(seed)
    w = rng.normal(size=3)
    r = 1.0 + 0.25 * np.tanh(verts @ w) + 0.1 * verts[:, 0] * verts[:, 1]
    return verts * r[:, None], faces


def test_wks_rigid_invariance_mesh():
    """WKS depends only on the LBO spectrum -> exactly invariant to
    rotation+translation (the property that makes it a usable anchor)."""
    verts, faces = _bumpy_sphere(2)
    d0 = wks_descriptors(verts, faces, num_e=32, k_eig=48)
    d1 = wks_descriptors(verts @ _rot().T + 0.37, faces, num_e=32, k_eig=48)
    assert d0.shape == (len(verts), 32)
    np.testing.assert_allclose(d0, d1, atol=5e-4)


def test_wks_pointcloud_fallback_invariance():
    """No faces -> kNN-graph Laplacian; still rigid-invariant (graph
    weights depend only on pairwise distances)."""
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(300, 3)).astype(np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    d0 = wks_descriptors(verts, None, num_e=16, k_eig=32)
    d1 = wks_descriptors(verts @ _rot().T - 1.2, None, num_e=16, k_eig=32)
    np.testing.assert_allclose(d0, d1, atol=5e-4)
    # L2-normalised per point
    np.testing.assert_allclose(np.linalg.norm(d0, axis=1), 1.0, rtol=1e-5)


def test_preprocess_backfills_features_only(tmp_path):
    """A cache with verts/fps/dist already present (e.g. hard-linked from a
    sibling cache) gets features backfilled without recomputing geodesics."""
    from dvmatcher_tpu.data.dataset import preprocess_split

    root = tmp_path / "ds"
    (root / "shapes_train").mkdir(parents=True)
    verts, faces = _octa_sphere(1)
    with open(root / "shapes_train" / "s0.off", "w") as f:
        f.write(f"OFF\n{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")

    cache = tmp_path / "cache"
    preprocess_split(str(root), "train", str(cache), n_points=16, progress=False)
    dist_file = cache / "s0.dist.npy"
    sentinel = np.full((16, 16), -7.0, np.float32)
    np.save(dist_file, sentinel)  # would differ if recomputed

    calls = {}

    def feat_fn(v, f=None):
        calls["faces"] = f
        return np.ones((len(v), 4), np.float32)

    preprocess_split(
        str(root), "train", str(cache), n_points=16, feat_fn=feat_fn,
        progress=False,
    )
    assert calls["faces"] is not None and len(calls["faces"]) == len(faces)
    np.testing.assert_array_equal(np.load(dist_file), sentinel)
    assert np.load(cache / "s0.feat.npy").shape == (len(verts), 4)

    # third run: nothing to do, feat_fn must not be called again
    preprocess_split(
        str(root), "train", str(cache), n_points=16,
        feat_fn=lambda v, f=None: 1 / 0, progress=False,
    )


def test_backbone_accepts_narrow_anchor_features():
    """feat_dim is configurable (128-d WKS vs 1152-d DINO)."""
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.train import create_train_state, forward_features

    state, backbone, _, _ = create_train_state(
        jax.random.PRNGKey(0), n_points=64, feat_dim=8, k_backbone=8,
        k_deform=4,
    )
    fwd = forward_features(backbone)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 8))
    variables = {
        "params": state.params["backbone"],
        "batch_stats": state.batch_stats["backbone"],
    }
    out = fwd(variables, xyz, feats)
    assert out.shape == (1, 64, 128)
    assert bool(jnp.isfinite(out).all())


def test_wks_config_loads():
    from dvmatcher_tpu.utils.config import load_config

    cfg = load_config("scape_r_wks")
    assert cfg["with_dino"] and cfg["feat_dim"] == 128
    assert cfg["dataset"]["cache_dir"] == "cache/scape_r_wks"
