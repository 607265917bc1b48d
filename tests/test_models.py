"""Backbone/Deformer shape, determinism, and mask-invariance tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvmatcher_tpu.models import Uni3FC, Deformer, pos_encoding_sin_wave
from dvmatcher_tpu.ops import knn_idx, index_points
from dvmatcher_tpu.match import soft_correspondence


def test_pos_encoding_layout(rng):
    xyz = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
    pos = pos_encoding_sin_wave(xyz)
    assert pos.shape == (2, 10, 384)
    # channel layout: axis-major, then sin(0..63), cos(64..127)
    lo, hi = float(xyz.min()), float(xyz.max())
    normal = 2 * (np.asarray(xyz) - lo) / (hi - lo) - 1
    k0 = normal[..., 0] * np.pi  # axis 0, freq 2^0
    np.testing.assert_allclose(np.asarray(pos)[..., 0], np.sin(k0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos)[..., 64], np.cos(k0), atol=1e-5)
    k1 = normal[..., 1] * np.pi
    np.testing.assert_allclose(np.asarray(pos)[..., 128], np.sin(k1), atol=1e-5)


@pytest.fixture(scope="module")
def backbone_setup():
    model = Uni3FC(k=8)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 1152))
    variables = model.init(jax.random.PRNGKey(0), xyz, feats, False)
    return model, variables, xyz, feats


def test_backbone_shapes(backbone_setup):
    model, variables, xyz, feats = backbone_setup
    desc, cfeats = model.apply(variables, xyz, feats, False)
    assert desc.shape == (2, 64, 128)
    assert cfeats.shape == (2, 64, 64)
    assert np.all(np.isfinite(np.asarray(desc)))


def test_backbone_train_mutates_batch_stats(backbone_setup):
    model, variables, xyz, feats = backbone_setup
    (desc, _), updates = model.apply(
        variables, xyz, feats, True, mutable=["batch_stats"]
    )
    assert "batch_stats" in updates
    # running stats actually moved
    leaf0 = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    orig0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(orig0))


def test_backbone_no_feats_mode():
    model = Uni3FC(k=8)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), xyz, None, False)
    desc, cfeats = model.apply(variables, xyz, None, False)
    assert desc.shape == (1, 32, 128)


def test_backbone_mask_invariance(backbone_setup):
    """Padding the cloud and masking must reproduce the unpadded output —
    the core guarantee that lets TPU buckets replace the reference's
    per-mesh-size recompilation."""
    model, variables, xyz, feats = backbone_setup
    desc, _ = model.apply(variables, xyz, feats, False)

    pad = 16
    xyz_p = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
    feats_p = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    mask = jnp.arange(64 + pad) < 64
    mask = jnp.broadcast_to(mask, (2, 64 + pad))
    desc_p, _ = model.apply(variables, xyz_p, feats_p, False, mask)
    np.testing.assert_allclose(
        np.asarray(desc_p)[:, :64], np.asarray(desc), rtol=5e-3, atol=5e-5
    )


@pytest.mark.slow
def test_backbone_grads_finite(backbone_setup):
    model, variables, xyz, feats = backbone_setup

    def loss_fn(params):
        (desc, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xyz, feats, True, mutable=["batch_stats"],
        )
        return jnp.sum(desc**2)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    # every parameter receives gradient somewhere
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in flat)
    assert nonzero / len(flat) > 0.9


def test_deformer_shapes():
    b, n, m2, k, c, mn = 2, 32, 32, 10, 128, 16
    key = jax.random.PRNGKey(0)
    feat1 = jax.random.normal(key, (b, n, c))
    feat2 = jax.random.normal(jax.random.PRNGKey(1), (b, m2, c))
    verts1 = jax.random.normal(jax.random.PRNGKey(2), (b, n, 3))
    verts2 = jax.random.normal(jax.random.PRNGKey(3), (b, m2, 3))
    pi = soft_correspondence(feat1, feat2, 10.0)
    verts12 = pi @ verts2
    idx11 = knn_idx(verts1, verts1, k)
    idx22 = knn_idx(verts2, verts2, k)
    f1c = index_points(feat1, idx11)
    f2c = index_points(feat2, idx22)
    node_idx = jnp.tile(jnp.arange(mn), (b, 1))

    model = Deformer(k=k)
    variables = model.init(key, f1c, f2c, verts1, verts12, pi, node_idx)
    out = model.apply(variables, f1c, f2c, verts1, verts12, pi, node_idx)
    assert out.shape == (b, mn, 9)
    assert np.all(np.isfinite(np.asarray(out)))


def test_backbone_bf16_compute_mode(rng):
    """Mixed-precision inference (dtype=bfloat16): params stay f32 (one
    checkpoint serves both modes), outputs come back f32 and stay close to
    the f32 forward — the bench's fast single-MXU-pass path."""
    xyz = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(1, 64, 32)).astype(np.float32))

    m32 = Uni3FC(k=8, feat_dim=32)
    m16 = Uni3FC(k=8, feat_dim=32, dtype=jnp.bfloat16)
    v32 = m32.init(jax.random.PRNGKey(0), xyz, feats, False)
    v16 = m16.init(jax.random.PRNGKey(0), xyz, feats, False)

    # identical param trees: dtype is compute-only
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v32["params"], v16["params"],
    )

    d32, c32 = m32.apply(v32, xyz, feats, False)
    d16, c16 = m16.apply(v32, xyz, feats, False)
    assert d16.dtype == jnp.float32 and c16.dtype == jnp.float32

    # per-point cosine similarity of the descriptor fields
    a = np.asarray(d32).reshape(-1, d32.shape[-1])
    b = np.asarray(d16).reshape(-1, d16.shape[-1])
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    assert np.min(cos) > 0.98, float(np.min(cos))
