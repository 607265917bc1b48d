"""Auxiliary block smoke tests (API-surface modules, models/extras.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.models.extras import (
    CrossTransformer,
    Embedding,
    GlobalDownSample,
    LocalDownSample,
    UpSample,
)


def _r(s, sh):
    return jax.random.normal(jax.random.PRNGKey(s), sh)


def test_global_downsample():
    m = GlobalDownSample(npts_ds=16)
    x = _r(0, (2, 64, 32))
    v = m.init(jax.random.PRNGKey(1), x)
    out, idx = m.apply(v, x)
    assert out.shape == (2, 16, 32) and idx.shape == (2, 16)


def test_local_downsample():
    m = LocalDownSample(npts_ds=16, k=8)
    x = _r(0, (2, 64, 32))
    v = m.init(jax.random.PRNGKey(1), x)
    out, idx = m.apply(v, x)
    assert out.shape == (2, 16, 32)


def test_upsample():
    m = UpSample()
    up, down = _r(0, (2, 64, 32)), _r(1, (2, 16, 32))
    v = m.init(jax.random.PRNGKey(2), up, down)
    out = m.apply(v, up, down)
    assert out.shape == (2, 64, 32)


def test_embedding():
    m = Embedding(k=8)
    xyz = _r(0, (2, 64, 3))
    v = m.init(jax.random.PRNGKey(1), xyz, False)
    out = m.apply(v, xyz, False)
    assert out.shape == (2, 64, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cross_transformer():
    m = CrossTransformer()
    src, tgt = _r(0, (2, 32, 256)), _r(1, (2, 48, 256))
    v = m.init(jax.random.PRNGKey(2), src, tgt)
    out = m.apply(v, src, tgt)
    assert out.shape == (2, 32, 256)
