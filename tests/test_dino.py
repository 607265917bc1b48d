"""DINO feature-lifting pipeline tests (shape/flow; numeric parity requires
converted pretrained weights, supplied via tools/convert_dinov2.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvmatcher_tpu.models.dino import DinoV2ViT, JBUStack, FeatureLifter


def test_vit_token_grid():
    vit = DinoV2ViT(depth=2)  # shallow for test speed
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    params = vit.init(jax.random.PRNGKey(1), img)
    out = vit.apply(params, img)
    assert out.shape == (1, 16, 16, 384)
    assert np.all(np.isfinite(np.asarray(out)))


def test_vit_pos_embed_interpolation():
    """Pretrain grid 37x37 -> 16x16 must interpolate, not crash."""
    vit = DinoV2ViT(depth=1, pretrain_grid=37)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    params = vit.init(jax.random.PRNGKey(1), img)
    assert params["params"]["pos_embed"].shape == (1, 37 * 37 + 1, 384)
    out = vit.apply(params, img)
    assert out.shape == (1, 16, 16, 384)


def test_jbu_stack_upsamples_16_to_256():
    jbu = JBUStack()
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 32))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    params = jbu.init(jax.random.PRNGKey(2), feats, img)
    out = jbu.apply(params, feats, img)
    assert out.shape == (1, 256, 256, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_jbu_constant_preserved():
    """A constant feature map must upsample to (nearly) the same constant —
    the kernel is a normalised weighted average."""
    jbu = JBUStack(stages=1)
    feats = jnp.full((1, 8, 8, 4), 3.25)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    params = jbu.init(jax.random.PRNGKey(2), feats, img)
    # zero out the fixup residual for the invariance check
    params = jax.tree_util.tree_map(jnp.zeros_like, params) | {}
    p = jax.device_get(params)
    p["params"]["up_1"] = jax.device_get(
        jbu.init(jax.random.PRNGKey(2), feats, img)
    )["params"]["up_1"]
    out = jbu.apply(p, feats, img)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-5)


@pytest.mark.slow
def test_feature_lifter_end_to_end(rng):
    # shallow config for CPU test speed; the full 12/4 config runs on TPU
    lifter = FeatureLifter(vit_depth=2, jbu_stages=2)
    pc = jnp.asarray(rng.normal(size=(1, 60, 3)).astype(np.float32))
    params = lifter.init(jax.random.PRNGKey(0), pc)
    out = lifter.apply(params, pc)
    assert out.shape == (1, 60, 1152)
    # each view block is L2-normalised per point
    norms = np.linalg.norm(np.asarray(out)[..., :384], axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    # frozen: no gradient flows
    g = jax.grad(lambda p: lifter.apply(p, pc).sum())(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total == 0.0
