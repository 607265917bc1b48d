"""Soft/hard correspondence tests (reference models/loss.py:110-124,
1339-1347; test.py:19-28)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.match import (
    nn_correspondence,
    soft_correspondence,
    soft_project,
    topk_sparsify,
)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_soft_correspondence_oracle(rng):
    a = rng.normal(size=(1, 12, 8)).astype(np.float32)
    b = rng.normal(size=(1, 15, 8)).astype(np.float32)
    alpha = 37.0
    pi = np.asarray(soft_correspondence(jnp.asarray(a), jnp.asarray(b), alpha))
    d = np.linalg.norm(a[0][:, None] - b[0][None], axis=-1)
    want = _softmax(-alpha * d)
    np.testing.assert_allclose(pi[0], want, rtol=1e-3, atol=1e-6)


def test_topk_sparsify(rng):
    pi = np.asarray(
        soft_correspondence(
            jnp.asarray(rng.normal(size=(1, 20, 4)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, 30, 4)).astype(np.float32)),
            10.0,
        )
    )
    sp = np.asarray(topk_sparsify(jnp.asarray(pi), 10))
    assert ((sp > 0).sum(-1) == 10).all()
    # kept entries are the largest ones, values unchanged
    want_idx = np.argsort(-pi, axis=-1)[..., :10]
    got = np.sort(sp, axis=-1)[..., ::-1][..., :10]
    want = np.sort(np.take_along_axis(pi, want_idx, -1), axis=-1)[..., ::-1]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_topk_gradients_only_on_kept(rng):
    a = jnp.asarray(rng.normal(size=(1, 6, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 9, 3)).astype(np.float32))

    def f(fa):
        pi = topk_sparsify(soft_correspondence(fa, b, 5.0), 3)
        return jnp.sum(soft_project(pi, b) ** 2)

    g = jax.grad(f)(a)
    assert np.all(np.isfinite(np.asarray(g)))


def test_nn_correspondence_identity(rng):
    f = jnp.asarray(rng.normal(size=(1, 25, 16)).astype(np.float32))
    t = np.asarray(nn_correspondence(f, f))
    np.testing.assert_array_equal(t[0], np.arange(25))


def test_nn_correspondence_masked(rng):
    fa = jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(1, 12, 4)).astype(np.float32))
    mask = jnp.arange(12) < 7
    t = np.asarray(nn_correspondence(fa, fb, mask_b=mask[None]))
    assert t.max() < 7


def test_topk_soft_correspondence_matches_dense(rng):
    from dvmatcher_tpu.match import (
        soft_correspondence,
        sparse_project,
        topk_soft_correspondence,
        topk_sparsify,
    )

    b, n, m, c, k = 2, 37, 29, 8, 5
    fa = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, m, 4, 3)).astype(np.float32))

    dense = topk_sparsify(soft_correspondence(fa, fb, 7.0), k, exact=True)
    vals, idx = topk_soft_correspondence(fa, fb, 7.0, k)

    # scattered sparse == dense
    scat = np.zeros((b, n, m), np.float32)
    for bi in range(b):
        for i in range(n):
            scat[bi, i, np.asarray(idx[bi, i])] = np.asarray(vals[bi, i])
    np.testing.assert_allclose(scat, np.asarray(dense), atol=1e-6)

    # sparse projection (with trailing dims) == dense einsum
    want = jnp.einsum("bnm,bmkc->bnkc", dense, v)
    got = sparse_project(vals, idx, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_topk_soft_correspondence_grads_match_dense(rng):
    from dvmatcher_tpu.match import (
        soft_correspondence,
        sparse_project,
        topk_soft_correspondence,
        topk_sparsify,
        soft_project,
    )

    b, n, m, c, k = 1, 23, 19, 6, 4
    fa = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32))

    def f_dense(a, bb):
        pi = topk_sparsify(soft_correspondence(a, bb, 5.0), k, exact=True)
        return jnp.sum(jnp.sin(soft_project(pi, v)))

    def f_sparse(a, bb):
        vals, idx = topk_soft_correspondence(a, bb, 5.0, k)
        return jnp.sum(jnp.sin(sparse_project(vals, idx, v)))

    gd = jax.grad(f_dense, argnums=(0, 1))(fa, fb)
    gs = jax.grad(f_sparse, argnums=(0, 1))(fa, fb)
    for d, s in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d), atol=1e-5)
