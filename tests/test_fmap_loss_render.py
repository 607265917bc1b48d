"""DQFM-style fmap loss + depth renderer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.losses.fmap_loss import FmapLossConfig, dqfm_loss
from dvmatcher_tpu.ops.render import batch_render, render_depth


def test_dqfm_identity_maps_zero_structural_loss():
    eye = jnp.tile(jnp.eye(12), (2, 1, 1))
    cfg = FmapLossConfig(w_dist=0.0)
    loss, aux = dqfm_loss(eye, eye, eye, eye, cfg=cfg)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_dqfm_penalises_non_orthogonal():
    eye = jnp.tile(jnp.eye(8), (1, 1, 1))
    bad = eye * 2.0
    cfg = FmapLossConfig(w_dist=0.0)
    loss, aux = dqfm_loss(bad, eye, eye, eye, cfg=cfg)
    assert float(aux["ortho_loss"]) > 0
    assert float(aux["bij_loss"]) > 0
    assert float(aux["res_loss"]) > 0


def test_dqfm_with_dist_term(rng):
    b, n, c, k_dim = 1, 40, 8, 6
    feat = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    pts = rng.normal(size=(n, 3))
    dist = jnp.asarray(
        np.tile(np.linalg.norm(pts[:, None] - pts[None], axis=-1)[None], (b, 1, 1)),
        jnp.float32,
    )
    eye = jnp.tile(jnp.eye(k_dim), (b, 1, 1))
    cfg = FmapLossConfig(n_dist=8, k_dist=5)
    loss, aux = dqfm_loss(
        eye, eye, eye, eye, feat, feat, dist, dist, jax.random.PRNGKey(0), cfg
    )
    assert np.isfinite(float(loss))
    assert float(aux["dist_loss"]) > 0


def test_render_depth_sphere(rng):
    t = rng.normal(size=(1, 500, 3)).astype(np.float32)
    pc = jnp.asarray(t / np.linalg.norm(t, axis=-1, keepdims=True))  # unit sphere
    d = render_depth(pc, elev=0.0, azim=0.0, dist=3.0, img_size=64)
    d = np.asarray(d[0])
    filled = d < 1e9
    assert filled.mean() > 0.005
    # nearest visible depth ~ dist - 1 (front of the sphere)
    assert abs(d[filled].min() - 2.0) < 0.3


def test_batch_render_views(rng):
    pc = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    out = batch_render(pc, elevations=(0.0,), azimuths=(0.0, 180.0), img_size=32)
    assert out.shape == (2, 2, 32, 32)


def test_run_rendering_cameras_and_colored_maps(rng):
    from dvmatcher_tpu.ops.geometry import BIG
    from dvmatcher_tpu.ops.render import colored_depth_maps, run_rendering

    pts = jnp.asarray(rng.standard_normal((256, 3)), jnp.float32)
    raw = run_rendering(pts, num_views=4, img_size=64)
    assert raw.shape == (4, 64, 64)
    occupied = np.asarray(raw < BIG / 2)
    # every view sees the cloud
    assert occupied.reshape(4, -1).sum(axis=1).min() > 10
    # splatting dilates coverage vs zero-radius
    raw0 = run_rendering(pts, num_views=4, img_size=64, splat_radius=0.0)
    assert occupied.sum() > np.asarray(raw0 < BIG / 2).sum()

    imgs = colored_depth_maps(raw)
    assert imgs.shape == (4, 64, 64, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0

    raw2, imgs2 = run_rendering(pts, num_views=4, img_size=64, return_images=True)
    np.testing.assert_allclose(np.asarray(raw2), np.asarray(raw))


def test_run_rendering_requires_square_view_count(rng):
    from dvmatcher_tpu.ops.render import run_rendering

    pts = jnp.zeros((8, 3))
    try:
        run_rendering(pts, num_views=5, img_size=16)
        assert False, "expected assertion"
    except AssertionError:
        pass
