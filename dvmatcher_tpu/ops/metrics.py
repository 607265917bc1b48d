"""Auxiliary metrics: F-score, Sinkhorn EMD, truncated chamfer,
neighborhood Gaussian statistics + KL divergence.

Replaces the reference's CUDA auction EMD (misc/scirpts/emd_module.py —
approximate assignment EMD) with entropy-regularised Sinkhorn iterations in
XLA (`lax.scan` over log-domain updates), and ports fscore
(misc/scirpts/fscore.py:4-17), the pytorch3d-based truncated chamfer
(models/loss.py:185-345), and misc/gaussian_kl.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmatcher_tpu.ops.geometry import index_points, knn_with_dist, sq_dist


def fscore(dist1: jax.Array, dist2: jax.Array, threshold: float = 0.001):
    """(fscore, precision, recall) from squared chamfer distances (B, N)."""
    p1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    p2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    f = 2 * p1 * p2 / (p1 + p2)
    return jnp.nan_to_num(f), p1, p2


def sinkhorn_emd(
    a: jax.Array,
    b: jax.Array,
    eps: float = 0.01,
    iters: int = 200,
) -> tuple[jax.Array, jax.Array]:
    """Entropy-regularised EMD between equal-weight clouds (B, N, 3)/(B, M, 3).

    Returns (per-a-point transport cost (B, N), transport plan (B, N, M)).
    Log-domain Sinkhorn, uniform marginals — the XLA-native replacement for
    the auction-algorithm CUDA extension (used by aux eval scripts only).
    """
    n, m = a.shape[-2], b.shape[-2]
    cost = sq_dist(a, b)  # (B, N, M)
    log_mu = -jnp.log(n) * jnp.ones(cost.shape[:-1])  # (B, N)
    log_nu = -jnp.log(m) * jnp.ones((*cost.shape[:-2], m))  # (B, M)
    k = -cost / eps

    def body(carry, _):
        f, g = carry
        # log-domain updates: f_i = eps*(log mu_i - lse_j((g_j - c_ij)/eps))
        f = eps * (log_mu - jax.nn.logsumexp(k + g[..., None, :] / eps, axis=-1))
        g = eps * (log_nu - jax.nn.logsumexp(k + f[..., :, None] / eps, axis=-2))
        return (f, g), None

    f0 = jnp.zeros(cost.shape[:-1])
    g0 = jnp.zeros((*cost.shape[:-2], m))
    (f, g), _ = jax.lax.scan(body, (f0, g0), None, length=iters)
    log_plan = (f[..., :, None] + g[..., None, :] - cost) / eps
    plan = jnp.exp(log_plan)
    per_point = jnp.sum(plan * cost, axis=-1) * n  # scale to per-point cost
    return per_point, plan


def truncated_chamfer(
    a: jax.Array,
    b: jax.Array,
    trunc: float,
    mask_a: jax.Array | None = None,
    mask_b: jax.Array | None = None,
) -> jax.Array:
    """Chamfer with distances above `trunc` zeroed
    (compute_truncated_chamfer_distance, models/loss.py:185-345)."""
    from dvmatcher_tpu.ops.chamfer import chamfer_squared

    d1, d2, _, _ = chamfer_squared(a, b, mask_a, mask_b)
    d1 = jnp.where(d1 >= trunc, 0.0, d1)
    d2 = jnp.where(d2 >= trunc, 0.0, d2)
    return jnp.mean(jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1))


def neighborhood_statistics(pc: jax.Array, k: int):
    """Per-point neighborhood mean + covariance of centred kNN offsets
    (misc/gaussian_kl.py:41-62). pc (B, N, 3) -> mu (B,N,3), sigma (B,N,3,3)."""
    _, idx = knn_with_dist(pc, pc, k + 1)
    nbrs = index_points(pc, idx[:, :, 1:])  # exclude self
    offsets = nbrs - pc[:, :, None, :]  # (B, N, k, 3)
    mu = jnp.mean(offsets, axis=2)
    centred = offsets - jnp.mean(offsets, axis=2, keepdims=True)
    sigma = jnp.einsum("bnki,bnkj->bnij", centred, centred) / (k - 1)
    return mu, sigma


def gaussian_kl(mu1, cov1, mu2, cov2, jitter: float = 1e-6):
    """KL(N1 || N2) between batched 3D Gaussians (misc/gaussian_kl.py)."""
    d = mu1.shape[-1]
    eye = jnp.eye(d)
    cov1 = cov1 + jitter * eye
    cov2 = cov2 + jitter * eye
    inv2 = jnp.linalg.inv(cov2)
    diff = (mu2 - mu1)[..., None]
    tr = jnp.trace(inv2 @ cov1, axis1=-2, axis2=-1)
    maha = (jnp.swapaxes(diff, -1, -2) @ inv2 @ diff)[..., 0, 0]
    logdet = jnp.linalg.slogdet(cov2)[1] - jnp.linalg.slogdet(cov1)[1]
    return 0.5 * (tr + maha - d + logdet)


def gmof(residual: jax.Array, rho: float = 1.0) -> jax.Array:
    """Geman-McClure robust error function (reference lib/utils.py:145-158):
    rho^2 * r^2 / (r^2 + rho^2) — saturates at rho^2 for outliers."""
    sq = residual * residual
    return rho * rho * sq / (sq + rho * rho)


def projective_depth_cost(dx: jax.Array, dy: jax.Array) -> jax.Array:
    """Mean squared depth error over pixels where BOTH depth maps are
    occupied (> 0) — reference models/loss.py:374-382. Static-shape masked
    mean (the reference boolean-indexes, which is dynamic)."""
    m = (dx > 0) & (dy > 0)
    err = jnp.where(m, (dx - dy) ** 2, 0.0)
    return jnp.sum(err) / jnp.maximum(jnp.sum(m), 1)


def silhouette_cost(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean squared error of x against y over pixels OUTSIDE y's
    silhouette (channel 0 <= 0) — reference models/loss.py:384-392."""
    m = ~(y[..., 0] > 0)
    err = jnp.where(m[..., None], (x - y) ** 2, 0.0)
    cnt = jnp.maximum(jnp.sum(m) * x.shape[-1], 1)
    return jnp.sum(err) / cnt


def landmark_cost(x: jax.Array, y: jax.Array, landmarks: jax.Array) -> jax.Array:
    """Mean squared distance between corresponding landmark rows
    (reference models/loss.py:394-399): landmarks (2, L) indexes x and y."""
    xs = x[landmarks[0]]
    ys = y[landmarks[1]]
    return jnp.mean(jnp.sum((xs - ys) ** 2, axis=-1))


def ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Structural similarity index, torchmetrics-default semantics.

    The reference constructs `StructuralSimilarityIndexMeasure` for its
    w_img term (models/loss.py:760,1109) but never invokes it (img_loss
    stays 0); rebuilt here so the term is actually wireable. Gaussian
    11x11 window (sigma 1.5), per-channel local moments via depthwise
    convolution, mean over all windows/channels/batch.

    x, y: (B, C, H, W) or (B, H, W, C) with C <= 4 (NHWC detected by the
    trailing dim). Returns a scalar in [-1, 1].
    """
    if x.shape[-1] > 4:  # NCHW -> NHWC
        x = jnp.moveaxis(x, 1, -1)
        y = jnp.moveaxis(y, 1, -1)
    half = kernel_size // 2
    g = jnp.exp(-0.5 * ((jnp.arange(kernel_size) - half) / sigma) ** 2)
    g = g / jnp.sum(g)
    win = jnp.outer(g, g)  # (K, K)

    def local_mean(img):
        # depthwise valid conv: (B, H, W, C) -> (B, H', W', C)
        c = img.shape[-1]
        kern = jnp.broadcast_to(win[:, :, None, None], (kernel_size, kernel_size, 1, c))
        return jax.lax.conv_general_dilated(
            img, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mx, my = local_mean(x), local_mean(y)
    mxx = local_mean(x * x) - mx * mx
    myy = local_mean(y * y) - my * my
    mxy = local_mean(x * y) - mx * my
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mx * my + c1) * (2 * mxy + c2)
    den = (mx * mx + my * my + c1) * (mxx + myy + c2)
    return jnp.mean(num / den)
