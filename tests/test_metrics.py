"""Metrics tests: fscore, Sinkhorn EMD, truncated chamfer, gaussian KL,
similarity/normalisation utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.match.similarity import (
    get_s_t_neighbors,
    measure_similarity,
    normalize_p,
)
from dvmatcher_tpu.ops.metrics import (
    fscore,
    gaussian_kl,
    neighborhood_statistics,
    sinkhorn_emd,
    truncated_chamfer,
)


def test_fscore_identical_clouds():
    d = jnp.zeros((2, 50))
    f, p, r = fscore(d, d)
    np.testing.assert_allclose(np.asarray(f), 1.0)


def test_fscore_nan_to_zero():
    d = jnp.ones((1, 10)) * 100
    f, p, r = fscore(d, d)
    np.testing.assert_allclose(np.asarray(f), 0.0)


def test_sinkhorn_identity(rng):
    a = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
    cost, plan = sinkhorn_emd(a, a, eps=0.005, iters=300)
    # transport cost of a cloud to itself ~ 0; plan ~ identity/n
    assert float(cost.mean()) < 1e-3
    np.testing.assert_allclose(
        np.asarray(plan.sum(-1)), 1.0 / 16, rtol=1e-2
    )


def test_sinkhorn_translation_cost(rng):
    a = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
    b = a + jnp.array([1.0, 0, 0])
    cost, _ = sinkhorn_emd(a, b, eps=0.01, iters=300)
    np.testing.assert_allclose(float(cost.mean()), 1.0, rtol=0.1)


def test_truncated_chamfer(rng):
    a = jnp.asarray(rng.normal(size=(1, 30, 3)).astype(np.float32))
    b = jnp.concatenate([a[:, :29], jnp.full((1, 1, 3), 100.0)], axis=1)
    full = float(truncated_chamfer(a, b, trunc=1e9))
    trunc = float(truncated_chamfer(a, b, trunc=1.0))
    assert trunc < full  # outlier zeroed out


def test_gaussian_kl_zero_for_identical(rng):
    pc = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    mu, sig = neighborhood_statistics(pc, k=8)
    kl = gaussian_kl(mu, sig, mu, sig)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-4)
    assert mu.shape == (1, 40, 3) and sig.shape == (1, 40, 3, 3)


def test_measure_similarity_modes(rng):
    a = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 9, 4)).astype(np.float32))
    for kind in ("cosine", "mult", "l2", "negative_l2", "difference_exp",
                 "difference_inverse", "difference_max_norm"):
        s = measure_similarity(kind, a, b)
        assert s.shape == (1, 8, 9), kind
        assert np.all(np.isfinite(np.asarray(s))), kind
    cos = np.asarray(measure_similarity("cosine", a, a))
    np.testing.assert_allclose(np.diagonal(cos[0]), 1.0, rtol=1e-5)


def test_normalize_p_and_neighbors(rng):
    p = jnp.asarray(np.abs(rng.normal(size=(1, 6, 7))).astype(np.float32))
    l1 = normalize_p(p, "l1", axis=2)
    np.testing.assert_allclose(np.asarray(l1.sum(2)), 1.0, rtol=1e-5)
    sw, ss, si, tw, ts, ti = get_s_t_neighbors(3, p, "softmax")
    assert si.shape == (1, 6, 3) and ti.shape == (1, 7, 3)
    np.testing.assert_allclose(np.asarray(sw.sum(2)), 1.0, rtol=1e-5)


def test_gmof_saturates():
    from dvmatcher_tpu.ops.metrics import gmof

    r = jnp.asarray([0.0, 0.1, 100.0])
    out = np.asarray(gmof(r, rho=2.0))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 4 * 0.01 / (0.01 + 4), rtol=1e-6)
    assert out[2] < 4.0 and out[2] > 3.99  # saturates at rho^2


def test_aux_costs_match_reference_semantics():
    from dvmatcher_tpu.ops.metrics import (
        landmark_cost,
        projective_depth_cost,
        silhouette_cost,
    )

    rng = np.random.default_rng(0)
    dx = rng.uniform(-1, 1, (8, 8)).astype(np.float32)
    dy = rng.uniform(-1, 1, (8, 8)).astype(np.float32)
    m = (dx > 0) & (dy > 0)
    want = ((dx - dy) ** 2)[m].mean()
    np.testing.assert_allclose(
        float(projective_depth_cost(jnp.asarray(dx), jnp.asarray(dy))),
        want, rtol=1e-6,
    )

    x = rng.uniform(-1, 1, (6, 6, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (6, 6, 3)).astype(np.float32)
    m2 = ~(y[..., 0] > 0)
    want2 = ((x - y) ** 2)[m2].mean()
    np.testing.assert_allclose(
        float(silhouette_cost(jnp.asarray(x), jnp.asarray(y))), want2, rtol=1e-6
    )

    pts1 = rng.normal(size=(10, 3)).astype(np.float32)
    pts2 = rng.normal(size=(12, 3)).astype(np.float32)
    lm = np.asarray([[1, 3, 5], [0, 2, 9]])
    want3 = np.sum((pts1[lm[0]] - pts2[lm[1]]) ** 2, -1).mean()
    np.testing.assert_allclose(
        float(landmark_cost(jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(lm))),
        want3, rtol=1e-6,
    )


def test_ssim_identity_and_oracle(rng):
    from scipy.ndimage import convolve

    from dvmatcher_tpu.ops.metrics import ssim

    x = rng.random((1, 16, 16, 2)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-6

    y = (x + 0.1 * rng.standard_normal(x.shape)).astype(np.float32)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))

    # independent oracle: scipy valid-mode gaussian windowed moments
    k = 11
    g = np.exp(-0.5 * ((np.arange(k) - k // 2) / 1.5) ** 2)
    g /= g.sum()
    win = np.outer(g, g)

    def lm(img):
        out = np.stack(
            [convolve(img[0, :, :, c], win, mode="constant") for c in range(2)],
            axis=-1,
        )
        return out[None, k // 2 : -(k // 2), k // 2 : -(k // 2), :]

    mx, my = lm(x), lm(y)
    vx = lm(x * x) - mx * mx
    vy = lm(y * y) - my * my
    cxy = lm(x * y) - mx * my
    c1, c2 = 0.01**2, 0.03**2
    ref = np.mean(
        ((2 * mx * my + c1) * (2 * cxy + c2))
        / ((mx**2 + my**2 + c1) * (vx + vy + c2))
    )
    assert abs(got - float(ref)) < 1e-4
    assert got < 1.0


def test_ssim_nchw_accepted(rng):
    from dvmatcher_tpu.ops.metrics import ssim

    x = jnp.asarray(rng.random((2, 3, 20, 20)), jnp.float32)
    y = x * 0.5
    s = float(ssim(x, y, data_range=1.0))
    assert np.isfinite(s) and s < 1.0
