"""Loss-suite tests: oracles for the dist profile term, end-to-end loss
evaluation + gradients through Deformer params, full vs partial variants."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.losses import LossConfig, dist_profile_loss, graph_deform_loss
from dvmatcher_tpu.models import Deformer
import pytest


def _np_cos(a, b, eps=1e-8):
    dot = (a * b).sum(-1)
    na = np.linalg.norm(a, axis=-1)
    nb = np.linalg.norm(b, axis=-1)
    return dot / np.maximum(na * nb, eps)


def test_dist_profile_loss_oracle(rng):
    b, n, c, n_dist, k = 2, 40, 8, 10, 5
    feat = rng.normal(size=(b, n, c)).astype(np.float32)
    pts = rng.normal(size=(n, 3))
    dist = np.linalg.norm(pts[:, None] - pts[None], axis=-1).astype(np.float32)
    dist = np.tile(dist[None], (b, 1, 1))
    anchors = rng.choice(n, size=n_dist, replace=False)

    got = float(
        dist_profile_loss(
            jnp.asarray(feat), jnp.asarray(dist), jnp.asarray(anchors), k
        )
    )

    # numpy oracle replicating loss.py:1351-1396 (one side)
    total = 0.0
    for bi in range(b):
        f1 = feat[bi][anchors]  # (n_dist, c)
        d = ((f1[:, None] - feat[bi][None]) ** 2).sum(-1)  # (n_dist, n)
        idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
        f2 = feat[bi][idx]  # (n_dist, k, c)
        d_feat = np.linalg.norm(f2 - f1[:, None], axis=-1)
        d_geo = np.stack(
            [dist[bi][idx[i], anchors[i]] for i in range(n_dist)]
        )
        total += (1 - np.abs(_np_cos(d_feat, d_geo))).sum()
    np.testing.assert_allclose(got, total, rtol=1e-3)


def _setup_loss(rng, partial=False, n1=48, n2=48):
    b, c = 2, 16
    feat1 = jnp.asarray(rng.normal(size=(b, n1, c)).astype(np.float32))
    feat2 = jnp.asarray(rng.normal(size=(b, n2, c)).astype(np.float32))
    verts1 = jnp.asarray(rng.normal(size=(b, n1, 3)).astype(np.float32))
    verts2 = jnp.asarray(rng.normal(size=(b, n2, 3)).astype(np.float32))

    def mkdist(verts, n):
        d = np.linalg.norm(
            np.asarray(verts)[:, :, None] - np.asarray(verts)[:, None], axis=-1
        )
        return jnp.asarray(d.astype(np.float32))

    dist1, dist2 = mkdist(verts1, n1), mkdist(verts2, n2)
    cfg = LossConfig(
        k_deform=4, k_dist=6, n_dist=8, partial=partial,
        w_map=0.0 if partial else 0.005,
    )
    deformer = Deformer(k=cfg.k_deform)
    dvars = deformer.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, n1, cfg.k_deform, c)),
        jnp.zeros((b, n2, cfg.k_deform, c)),
        verts1,
        verts1,
        jnp.zeros((b, n1, n2)),
        jnp.zeros((b, n1 // 2), jnp.int32),
    )
    return feat1, feat2, dist1, dist2, verts1, verts2, cfg, deformer, dvars


def test_graph_deform_loss_runs_and_is_finite(rng):
    feat1, feat2, dist1, dist2, verts1, verts2, cfg, deformer, dvars = _setup_loss(rng)

    def apply(f1c, f2c, v1, v12, pi, nodes):
        return deformer.apply(dvars, f1c, f2c, v1, v12, pi, nodes)

    loss, aux = jax.jit(
        lambda *a: graph_deform_loss(apply, *a, cfg=cfg)
    )(feat1, feat2, dist1, dist2, verts1, verts2, 50.0, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    for k in ("dist_loss", "deform_loss", "map_loss", "self_rec_loss"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["map_loss"]) > 0
    assert float(aux["dist_loss"]) > 0


@pytest.mark.slow
def test_loss_grads_flow_to_deformer_and_features(rng):
    feat1, feat2, dist1, dist2, verts1, verts2, cfg, deformer, dvars = _setup_loss(rng)

    def loss_fn(params, f1):
        def apply(f1c, f2c, v1, v12, pi, nodes):
            return deformer.apply({"params": params}, f1c, f2c, v1, v12, pi, nodes)

        loss, _ = graph_deform_loss(
            apply, f1, feat2, dist1, dist2, verts1, verts2, 50.0,
            jax.random.PRNGKey(1), cfg=cfg,
        )
        return loss

    g_params, g_feat = jax.grad(loss_fn, argnums=(0, 1))(dvars["params"], feat1)
    leaves = jax.tree_util.tree_leaves(g_params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert np.all(np.isfinite(np.asarray(g_feat)))
    assert float(jnp.abs(g_feat).sum()) > 0


def test_partial_variant_asymmetric_clouds(rng):
    feat1, feat2, dist1, dist2, verts1, verts2, cfg, deformer, dvars = _setup_loss(
        rng, partial=True, n1=48, n2=24
    )

    def apply(f1c, f2c, v1, v12, pi, nodes):
        return deformer.apply(dvars, f1c, f2c, v1, v12, pi, nodes)

    loss, aux = graph_deform_loss(
        apply, feat1, feat2, dist1, dist2, verts1, verts2, 50.0,
        jax.random.PRNGKey(2), cfg=cfg,
    )
    assert np.isfinite(float(loss))
    assert float(aux["map_loss"]) == 0.0
    assert aux["verts12"].shape == (2, 48, 3)


def test_identical_features_give_small_self_rec(rng):
    """If feat1 == feat2 and verts1 == verts2, Pi ~ I at high alpha and the
    self-reconstruction chamfer collapses to ~0."""
    b, n, c = 1, 40, 16
    feat = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    d = np.linalg.norm(
        np.asarray(verts)[:, :, None] - np.asarray(verts)[:, None], axis=-1
    )
    dist = jnp.asarray(d.astype(np.float32))
    cfg = LossConfig(k_deform=4, k_dist=6, n_dist=8)
    deformer = Deformer(k=cfg.k_deform)
    dvars = deformer.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, n, cfg.k_deform, c)),
        jnp.zeros((b, n, cfg.k_deform, c)),
        verts, verts, jnp.zeros((b, n, n)), jnp.zeros((b, n // 2), jnp.int32),
    )

    def apply(f1c, f2c, v1, v12, pi, nodes):
        return deformer.apply(dvars, f1c, f2c, v1, v12, pi, nodes)

    _, aux = graph_deform_loss(
        apply, feat, feat, dist, dist, verts, verts, 1000.0,
        jax.random.PRNGKey(1), cfg=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(aux["verts12"]), np.asarray(verts), atol=1e-3
    )


def test_sliced_dist_columns_match_full(rng):
    """The sliced-column fast feed must reproduce the full-matrix loss."""
    b, n, c, n_dist, k = 2, 40, 8, 10, 5
    feat = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    pts = rng.normal(size=(n, 3))
    dist = np.linalg.norm(pts[:, None] - pts[None], axis=-1).astype(np.float32)
    dist = np.tile(dist[None], (b, 1, 1))
    anchors = rng.choice(n, size=n_dist, replace=False)

    full = float(
        dist_profile_loss(feat, jnp.asarray(dist), jnp.asarray(anchors), k)
    )
    cols = jnp.asarray(dist[:, :, anchors])  # (B, N, n_dist)
    sliced = float(dist_profile_loss(feat, cols, jnp.asarray(anchors), k))
    np.testing.assert_allclose(sliced, full, rtol=1e-5)


def test_batches_anchor_slicing(rng):
    from dvmatcher_tpu.data.dataset import PairDataset, ShapeRecord

    n = 30
    verts = rng.normal(size=(n, 3)).astype(np.float32)
    dist = np.linalg.norm(verts[:, None] - verts[None], axis=-1).astype(np.float32)
    rec = ShapeRecord("a", verts, np.arange(n), dist, None)
    ds = PairDataset([rec, rec, rec], mode="train")
    batch = next(iter(ds.batches(2, anchor_slices=7)))
    assert batch["shape1"]["dist"].shape == (2, n, 7)
    assert batch["anchors1"].shape == (7,)
    a = batch["anchors1"]
    # the feed ships bf16 (half the host->device bytes)
    np.testing.assert_allclose(
        np.asarray(batch["shape1"]["dist"][0], np.float32),
        dist[:, a],
        rtol=8e-3,
    )


def test_img_ssim_term_wired(rng):
    """w_img > 0 activates the SSIM image term the reference only
    constructs (loss.py:760): finite, in [0, 2*w_img], reported in aux."""
    feat1, feat2, dist1, dist2, verts1, verts2, cfg, deformer, dvars = _setup_loss(rng)
    import dataclasses

    cfg = dataclasses.replace(cfg, w_img=0.5)

    def apply(f1c, f2c, v1, v12, pi, nodes):
        return deformer.apply(dvars, f1c, f2c, v1, v12, pi, nodes)

    loss, aux = graph_deform_loss(
        apply, feat1, feat2, dist1, dist2, verts1, verts2, 50.0,
        jax.random.PRNGKey(1), cfg=cfg,
    )
    v = float(aux["img_loss"])
    assert np.isfinite(v) and 0.0 <= v <= 1.0
    assert np.isfinite(float(loss))


def test_sparse_pi_loss_matches_dense(rng):
    """The sparse top-k Π training path (w_rank==0) must reproduce the
    dense-Π loss terms exactly (same key, same cfg otherwise)."""
    import dataclasses

    feat1, feat2, dist1, dist2, verts1, verts2, cfg, deformer, dvars = _setup_loss(rng)

    def apply(f1c, f2c, v1, v12, pi, nodes):
        return deformer.apply(dvars, f1c, f2c, v1, v12, pi, nodes)

    key = jax.random.PRNGKey(3)
    _, aux_sparse = graph_deform_loss(
        apply, feat1, feat2, dist1, dist2, verts1, verts2, 50.0, key, cfg=cfg
    )
    # w_rank > 0 forces the dense-Π path; the rank term itself only adds
    # rank_loss, every shared aux term must agree
    cfg_dense = dataclasses.replace(cfg, w_rank=1e-12)
    _, aux_dense = graph_deform_loss(
        apply, feat1, feat2, dist1, dist2, verts1, verts2, 50.0, key,
        cfg=cfg_dense,
    )
    for k in ("dist_loss", "deform_loss", "map_loss", "self_rec_loss"):
        np.testing.assert_allclose(
            float(aux_sparse[k]), float(aux_dense[k]), rtol=2e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(aux_sparse["verts12"]), np.asarray(aux_dense["verts12"]),
        atol=5e-5,
    )


def test_sparse_pi_gradients_match_dense(rng):
    """Gradient semantics of the sparse top-k Π path: grads w.r.t. the
    descriptor fields must equal the dense topk_sparsify path's (reference
    loss.py:1339-1347 keeps gradients only on kept entries)."""
    import dataclasses

    feat1, feat2, dist1, dist2, verts1, verts2, cfg, deformer, dvars = _setup_loss(rng)

    def apply(f1c, f2c, v1, v12, pi, nodes):
        return deformer.apply(dvars, f1c, f2c, v1, v12, pi, nodes)

    key = jax.random.PRNGKey(5)

    def scalar(f1, f2, c):
        loss, _ = graph_deform_loss(
            apply, f1, f2, dist1, dist2, verts1, verts2, 50.0, key, cfg=c
        )
        return loss

    g_sp = jax.grad(scalar, argnums=(0, 1))(feat1, feat2, cfg)
    cfg_dense = dataclasses.replace(cfg, w_rank=1e-12)
    g_dn = jax.grad(scalar, argnums=(0, 1))(feat1, feat2, cfg_dense)
    for a, b, nm in ((g_sp[0], g_dn[0], "dfeat1"), (g_sp[1], g_dn[1], "dfeat2")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=nm)
