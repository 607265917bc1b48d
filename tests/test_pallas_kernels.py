"""Pallas kernel parity tests (interpreter mode on the CPU mesh; the same
kernel code compiles via Mosaic on TPU — verified in bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.ops.pallas import knn_attention, knn_attention_xla


def _rand(seed, shape):
    return jax.random.normal(jax.random.PRNGKey(seed), shape)


def test_knn_attention_matches_xla_exact():
    b, n, c, k = 2, 256, 64, 12
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    out_p = knn_attention(x, q, kk, v, knn_k=k, tile=128, precision="exact")
    out_x = knn_attention_xla(x, q, kk, v, knn_k=k, exact=True)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=1e-4, rtol=1e-3
    )


def test_knn_attention_fast_precision_close():
    """The default fast mode (compensated-bf16 distances, bf16 energy and
    value matmuls) must stay within softmax-rounding distance of exact."""
    b, n, c, k = 2, 256, 64, 12
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    out_f = knn_attention(x, q, kk, v, knn_k=k, tile=128, precision="fast")
    out_x = knn_attention_xla(x, q, kk, v, knn_k=k, exact=True)
    diff = np.abs(np.asarray(out_f) - np.asarray(out_x))
    scale = np.abs(np.asarray(out_x)).max()
    assert diff.max() / scale < 5e-2, diff.max() / scale
    assert diff.mean() / scale < 2e-3, diff.mean() / scale


def test_knn_attention_padding_mask():
    """Masked (padded) columns must not participate as neighbors."""
    b, n, c, k = 1, 256, 64, 8
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    valid = jnp.arange(n) < 200
    out_p = knn_attention(x, q, kk, v, valid[None], knn_k=k, tile=128,
                          precision="exact")
    out_x = knn_attention_xla(
        x[:, :200], q[:, :200], kk[:, :200], v[:, :200], knn_k=k, exact=True
    )
    np.testing.assert_allclose(
        np.asarray(out_p)[:, :200], np.asarray(out_x), atol=1e-4, rtol=1e-3
    )


def test_knn_attention_non_tile_multiple():
    b, n, c, k = 1, 200, 64, 8  # n not a multiple of the tile
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    out_p = knn_attention(x, q, kk, v, knn_k=k, tile=128, precision="exact")
    out_x = knn_attention_xla(x, q, kk, v, knn_k=k, exact=True)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=1e-4, rtol=1e-3
    )


def test_backbone_kernel_flag_param_compat():
    """use_kernel=True/False modules share one parameter pytree."""
    from dvmatcher_tpu.models import Uni3FC

    xyz = _rand(0, (1, 128, 3))
    feats = _rand(1, (1, 128, 1152))
    m0 = Uni3FC(k=8, use_kernel=False)
    m1 = Uni3FC(k=8, use_kernel=True)
    v0 = m0.init(jax.random.PRNGKey(0), xyz, feats, False)
    d0, _ = m0.apply(v0, xyz, feats, False)
    d1, _ = m1.apply(v0, xyz, feats, False)  # same params, kernel impl
    # the kernel path runs in fast (bf16) precision -> looser tolerance
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=8e-2)
    assert np.abs(np.asarray(d0) - np.asarray(d1)).mean() < 4e-3


def test_sa_attention_matches_xla():
    from dvmatcher_tpu.ops.pallas.sa_attention import sa_attention, sa_attention_xla

    b, n, d, c = 2, 300, 16, 64
    q = _rand(0, (b, n, d))
    v = _rand(1, (b, n, c))
    out_p = sa_attention(q, v, tile=128, precision="exact")
    out_x = sa_attention_xla(q, v)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=1e-4, rtol=1e-3
    )
    out_f = sa_attention(q, v, tile=128, precision="fast")
    diff = np.abs(np.asarray(out_f) - np.asarray(out_x))
    assert diff.max() / np.abs(np.asarray(out_x)).max() < 5e-2


def test_sa_attention_mask_matches_sliced():
    from dvmatcher_tpu.ops.pallas.sa_attention import sa_attention, sa_attention_xla

    b, n, d, c = 1, 256, 16, 64
    q = _rand(0, (b, n, d))
    v = _rand(1, (b, n, c))
    valid = jnp.arange(n) < 200
    out_p = sa_attention(q, v, valid[None], tile=128, precision="exact")
    out_x = sa_attention_xla(q[:, :200], v[:, :200])
    np.testing.assert_allclose(
        np.asarray(out_p)[:, :200], np.asarray(out_x), atol=1e-4, rtol=1e-3
    )


def test_ad_wrappers_gradients_match_xla():
    """custom_vjp (Pallas fwd, XLA bwd) must reproduce XLA gradients."""
    from dvmatcher_tpu.ops.pallas.knn_attention import (
        knn_attention_ad,
        knn_attention_xla,
    )
    from dvmatcher_tpu.ops.pallas.sa_attention import sa_attention_ad, sa_attention_xla

    b, n, c, k = 1, 128, 64, 8
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))

    g_ad = jax.grad(
        lambda q_: knn_attention_ad(x, q_, kk, v, None, k, 4, "exact").sum()
    )(q)
    g_x = jax.grad(
        lambda q_: knn_attention_xla(x, q_, kk, v, knn_k=k, exact=True).sum()
    )(q)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_x), atol=1e-4, rtol=1e-3)

    qs = _rand(5, (b, n, 16))
    g_ad = jax.grad(lambda v_: sa_attention_ad(qs, v_, None, "exact").sum())(v)
    g_x = jax.grad(lambda v_: sa_attention_xla(qs, v_).sum())(v)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_x), atol=1e-4, rtol=1e-3)


def test_pi_matmul_matches_xla_chain():
    """Fused Π kernel == topk_sparsify(soft_correspondence(..)) @ V."""
    from dvmatcher_tpu.match.soft import (
        soft_correspondence,
        soft_project,
        topk_sparsify,
    )
    from dvmatcher_tpu.ops.pallas.pi_search import pi_matmul

    b, n, m, c, cv, k = 2, 200, 160, 32, 3, 10
    fa = _rand(0, (b, n, c))
    fb = _rand(1, (b, m, c))
    v = _rand(2, (b, m, cv))
    alpha = 50.0
    out_k = pi_matmul(fa, fb, v, alpha, topk=k, tile=128, precision="exact")
    pi = topk_sparsify(soft_correspondence(fa, fb, alpha), k, exact=True)
    out_x = soft_project(pi, v)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), atol=1e-4, rtol=1e-3
    )


def test_pi_matmul_masked():
    from dvmatcher_tpu.match.soft import (
        soft_correspondence,
        soft_project,
        topk_sparsify,
    )
    from dvmatcher_tpu.ops.pallas.pi_search import pi_matmul

    b, n, m, c, cv, k = 1, 130, 140, 16, 4, 6
    fa = _rand(0, (b, n, c))
    fb = _rand(1, (b, m, c))
    v = _rand(2, (b, m, cv))
    valid = jnp.arange(m) < 100
    out_k = pi_matmul(
        fa, fb, v, 30.0, valid[None], topk=k, tile=128, precision="exact"
    )
    pi = topk_sparsify(
        soft_correspondence(fa[:, :, :], fb[:, :100], 30.0), k, exact=True
    )
    out_x = soft_project(pi, v[:, :100])
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), atol=1e-4, rtol=1e-3
    )


def test_nn_argmin_matches_xla():
    from dvmatcher_tpu.ops.geometry import sq_dist, masked_argmin
    from dvmatcher_tpu.ops.pallas.pi_search import nn_argmin

    b, n, m, c = 2, 200, 150, 24
    fa = _rand(0, (b, n, c))
    fb = _rand(1, (b, m, c))
    val_k, idx_k = nn_argmin(fa, fb, tile=128, precision="exact")
    val_x, idx_x = masked_argmin(sq_dist(fa, fb))
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_x))
    np.testing.assert_allclose(
        np.asarray(val_k), np.asarray(val_x), atol=1e-4, rtol=1e-4
    )


def test_nn_argmin_masked():
    from dvmatcher_tpu.ops.geometry import sq_dist, masked_argmin
    from dvmatcher_tpu.ops.pallas.pi_search import nn_argmin

    b, n, m, c = 1, 128, 160, 16
    fa = _rand(0, (b, n, c))
    fb = _rand(1, (b, m, c))
    valid = jnp.arange(m) < 90
    _, idx_k = nn_argmin(fa, fb, valid[None], tile=128, precision="exact")
    _, idx_x = masked_argmin(sq_dist(fa, fb[:, :90]))
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_x))


def test_knn_fused_backward_kernel_full_parity():
    """The fused Pallas backward (_bwd_kernel) must reproduce the XLA
    gather-path gradients for q, k, AND v under a nontrivial cotangent,
    masks, and a non-tile-multiple N."""
    from dvmatcher_tpu.ops.pallas.knn_attention import (
        knn_attention_ad,
        knn_attention_xla,
    )

    b, n, c, k = 2, 200, 64, 9
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    mask = jnp.arange(n)[None, :] < jnp.array([[n], [150]])[:, 0:1]
    w = _rand(7, (b, n, c))  # nontrivial output cotangent

    def f_pal(q_, k_, v_):
        return jnp.sum(
            knn_attention_ad(x, q_, k_, v_, mask, k, 4, "exact", "pallas") * w
        )

    def f_xla(q_, k_, v_):
        return jnp.sum(
            knn_attention_xla(x, q_, k_, v_, mask, knn_k=k, exact=True) * w
        )

    gp = jax.grad(f_pal, argnums=(0, 1, 2))(q, kk, v)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, kk, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
        )


def test_sa_fused_backward_kernel_full_parity():
    """sa_attention_bwd vs the XLA double-normalised attention VJP:
    dq (both Gram sides) and dv, with masks and nontrivial cotangent."""
    from dvmatcher_tpu.ops.pallas.sa_attention import (
        sa_attention_ad,
        sa_attention_xla,
    )

    b, n, d, c = 2, 200, 16, 64
    q = _rand(0, (b, n, d))
    v = _rand(1, (b, n, c))
    mask = jnp.arange(n)[None, :] < jnp.array([[n], [170]])[:, 0:1]
    w = _rand(2, (b, n, c))

    def f_pal(q_, v_):
        return jnp.sum(sa_attention_ad(q_, v_, mask, "exact", "pallas") * w)

    def f_xla(q_, v_):
        return jnp.sum(sa_attention_xla(q_, v_, mask) * w)

    gp = jax.grad(f_pal, argnums=(0, 1))(q, v)
    gx = jax.grad(f_xla, argnums=(0, 1))(q, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
        )


def test_knn_attention_cross_matches_self():
    """Cross variant with identical query/key sets == the self-attention
    kernel (the sharded forward's per-device shape)."""
    from dvmatcher_tpu.ops.pallas.knn_attention import knn_attention_cross

    b, n, c, k = 1, 256, 64, 8
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    out_self = knn_attention(x, q, kk, v, knn_k=k, tile=128, precision="exact")
    out_cross = knn_attention_cross(
        x, q, v, x, kk, v, knn_k=k, tile=128, precision="exact"
    )
    np.testing.assert_allclose(
        np.asarray(out_cross), np.asarray(out_self), atol=1e-4, rtol=1e-3
    )


def test_knn_attention_cross_row_slab():
    """A row slab of the cross kernel equals the same rows of the full
    kernel — exactly what each device computes in the sharded forward."""
    from dvmatcher_tpu.ops.pallas.knn_attention import knn_attention_cross

    b, n, c, k = 1, 256, 64, 8
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    full = knn_attention(x, q, kk, v, knn_k=k, tile=128, precision="exact")
    lo, hi = 64, 192
    slab = knn_attention_cross(
        x[:, lo:hi], q[:, lo:hi], v[:, lo:hi], x, kk, v,
        knn_k=k, tile=128, precision="exact",
    )
    np.testing.assert_allclose(
        np.asarray(slab), np.asarray(full)[:, lo:hi], atol=1e-4, rtol=1e-3
    )


def test_knn_attention_cross_masked_columns():
    from dvmatcher_tpu.ops.pallas.knn_attention import knn_attention_cross

    b, n, c, k = 1, 256, 64, 8
    x, q, kk, v = (_rand(i, (b, n, c)) for i in range(4))
    valid = jnp.arange(n) < 180
    out = knn_attention_cross(
        x[:, :64], q[:, :64], v[:, :64], x, kk, v, valid[None],
        knn_k=k, tile=64, precision="exact",
    )
    want = knn_attention_cross(
        x[:, :64], q[:, :64], v[:, :64], x[:, :180], kk[:, :180], v[:, :180],
        knn_k=k, tile=64, precision="exact",
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=1e-4, rtol=1e-3
    )


def test_sa_attention_cross_partials_reassemble():
    """P/S partials over two disjoint row slabs must sum to the full
    kernel's normalisation state: x_r == (P1+P2) / (1e-9 + S1+S2) — the
    psum_scatter contract of the sharded SALayer."""
    from dvmatcher_tpu.ops.pallas.sa_attention import (
        sa_attention,
        sa_attention_cross_partials,
    )

    b, n, d, c = 1, 256, 16, 64
    q = _rand(0, (b, n, d))
    v = _rand(1, (b, n, c))
    full = sa_attention(q, v, tile=128, precision="exact")
    p1, s1 = sa_attention_cross_partials(
        q[:, :128], q, v[:, :128], tile=128, precision="exact"
    )
    p2, s2 = sa_attention_cross_partials(
        q[:, 128:], q, v[:, 128:], tile=128, precision="exact"
    )
    got = (p1 + p2) / (1e-9 + (s1 + s2)[..., None])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(full), atol=1e-4, rtol=1e-3
    )


def test_selection_fp_bracket_invariant_and_tightness():
    """Illinois false-position + TERMINAL value-snap selection (round 5):
    on realistic squared point-cloud distances the 18-round fast-path
    default must (a) never under-select (count(d <= thr) >= K — the
    bracket invariant) and (b) land EXACTLY on the K-th order statistic
    for distinct distances (the terminal snap returns an actual data
    value).
    """
    from dvmatcher_tpu.ops.pallas.select import kth_smallest_threshold

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4995, 3)).astype(np.float32)
    rows = pts[:256]
    d = ((rows[:, None] - pts[None]) ** 2).sum(-1)  # (256, 4995) squared
    k = 40
    valid = jnp.ones((1, d.shape[1]), jnp.float32)
    exact_kth = np.partition(d, k - 1, axis=1)[:, k - 1]

    thr_fp = np.asarray(
        kth_smallest_threshold(jnp.asarray(d), k, valid, rounds=18,
                               method="fp"))[:, 0]
    cnt_fp = (d <= thr_fp[:, None]).sum(1)
    assert (cnt_fp >= k).all(), "under-selection breaks kNN semantics"
    assert cnt_fp.max() == k, f"over-selection: {cnt_fp.max()}"
    np.testing.assert_allclose(thr_fp, exact_kth, rtol=0, atol=0)

    thr_bi = np.asarray(
        kth_smallest_threshold(jnp.asarray(d), k, valid, rounds=24,
                               method="bisect"))[:, 0]
    cnt_bi = (d <= thr_bi[:, None]).sum(1)
    # the 18-round default must match old bisect-24 tightness on this data
    assert cnt_fp.max() <= max(cnt_bi.max(), k + 1)


def test_selection_fp_clustered_and_masked():
    """Adversarial shapes for interpolation: heavy ties/clusters, plus
    padded (masked) columns that must never be selected."""
    from dvmatcher_tpu.ops.pallas.select import kth_smallest_threshold

    rng = np.random.default_rng(1)
    # 16 tight clusters -> strongly non-uniform CDF with near-ties
    centers = rng.normal(size=(16, 3)) * 5
    pts = (centers[rng.integers(0, 16, 2048)]
           + 0.01 * rng.normal(size=(2048, 3))).astype(np.float32)
    rows = pts[:128]
    d = ((rows[:, None] - pts[None]) ** 2).sum(-1).astype(np.float32)
    n_valid = 1800
    BIG = np.float32(1e9)
    d[:, n_valid:] = BIG
    valid = jnp.asarray((np.arange(d.shape[1]) < n_valid)[None], jnp.float32)
    k = 24
    thr = np.asarray(
        kth_smallest_threshold(jnp.asarray(d), k, valid, rounds=18,
                               method="fp"))[:, 0]
    cnt = (d[:, :n_valid] <= thr[:, None]).sum(1)
    assert (cnt >= k).all()
    # ties within a cluster make exact-k impossible; bound the spill
    assert cnt.max() <= k + 64, cnt.max()
    assert (thr < BIG).all(), "masked columns leaked into the threshold"


def test_selection_fast_variant_knob():
    """Every DVM_FAST_SELECT variant (trace-time A/B knob) must satisfy
    the selection contract: never under-select, and reproduce the exact
    K-th order statistic on distinct realistic distances."""
    import os

    from dvmatcher_tpu.ops.pallas.select import kth_smallest_for_precision

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2048, 3)).astype(np.float32)
    d = ((pts[:64, None] - pts[None]) ** 2).sum(-1).astype(np.float32)
    k = 16
    valid = jnp.ones((1, d.shape[1]), jnp.float32)
    exact_kth = np.partition(d, k - 1, axis=1)[:, k - 1]
    old = os.environ.get("DVM_FAST_SELECT")
    try:
        for variant in ("fp18", "bisect24", "bisect20snap", "fp14"):
            os.environ["DVM_FAST_SELECT"] = variant
            thr = np.asarray(
                kth_smallest_for_precision(jnp.asarray(d), k, valid, "fast")
            )[:, 0]
            cnt = (d <= thr[:, None]).sum(1)
            assert (cnt >= k).all(), variant
            # exact selection SET on distinct data for every variant...
            assert cnt.max() == k, (variant, cnt.max())
            if variant != "bisect24":
                # ...and snap variants return the actual order statistic
                # (bisect24 returns a bracket point with the same count)
                np.testing.assert_allclose(thr, exact_kth, rtol=0, atol=0,
                                           err_msg=variant)
    finally:
        if old is None:
            os.environ.pop("DVM_FAST_SELECT", None)
        else:
            os.environ["DVM_FAST_SELECT"] = old
