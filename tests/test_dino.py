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


def test_jbu_stage_matches_pixel_oracle():
    """Single JBU stage numeric parity against an independent per-pixel
    numpy oracle fed through converted torch-layout weights.

    The oracle implements the JBU formula (FeatUp paper; reference
    train.py:72 loads the hub upsampler) with explicit python loops over
    hi-res pixels and window offsets — no shared code with the flax
    implementation, which uses shifted padded adds. Covers the 1x1-conv ->
    Dense transposition, edge padding, the half-pixel hi-res/lo-res
    alignment (p -> p/2 - 0.25) and the guidance-key pooling. FeatUp's
    upstream source is unavailable in this environment, so upstream
    behavioural parity is pinned by the documented formula, not its code.
    """
    torch = pytest.importorskip("torch")
    from tools.convert_dinov2 import convert_featup_upsampler
    from dvmatcher_tpu.models.dino.jbu import JBU

    g = torch.Generator().manual_seed(7)
    sd = {
        "upsampler.up1.range_proj.weight": torch.randn(6, 3, 1, 1, generator=g),
        "upsampler.up1.range_proj.bias": torch.randn(6, generator=g),
        "upsampler.up1.sigma_spatial": torch.tensor([1.3]),
        "upsampler.up1.log_sigma_range": torch.tensor([0.2]),
    }
    jbu_params, _, unmapped = convert_featup_upsampler(sd)
    assert all(k.startswith("up") or "fixup" in k for k in unmapped) or unmapped == []
    params = jbu_params["up_1"]

    rng = np.random.default_rng(11)
    h = w = 4
    C = 5
    lr = rng.normal(size=(1, h, w, C)).astype(np.float32)
    guidance = rng.normal(size=(1, 2 * h, 2 * w, 3)).astype(np.float32)

    got = JBU(key_dim=6, radius=2).apply({"params": params}, jnp.asarray(lr),
                                         jnp.asarray(guidance))

    # ---- oracle ----
    with torch.no_grad():
        gk = torch.nn.functional.conv2d(
            torch.tensor(guidance).permute(0, 3, 1, 2),
            sd["upsampler.up1.range_proj.weight"],
            sd["upsampler.up1.range_proj.bias"],
        ).permute(0, 2, 3, 1).numpy()[0]  # (2h, 2w, 6)
    # lo-res guidance key: 2x2 mean pool
    gk_lr = gk.reshape(h, 2, w, 2, 6).mean(axis=(1, 3))
    sig_sp = 1.3
    sig_rg = float(np.exp(0.2))
    r = 2
    want = np.zeros((2 * h, 2 * w, C))
    for py in range(2 * h):
        for px in range(2 * w):
            # hi-res pixel centre in lo-res coordinates
            ly, lx = py / 2 - 0.25, px / 2 - 0.25
            q0y, q0x = py // 2, px // 2
            num = np.zeros(C)
            den = 0.0
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    qy = min(max(q0y + di, 0), h - 1)  # edge padding
                    qx = min(max(q0x + dj, 0), w - 1)
                    # spatial distance uses the *unclamped* window position
                    dy = (q0y + di) - ly
                    dx = (q0x + dj) - lx
                    sp = (dy * dy + dx * dx) / (2 * sig_sp**2)
                    dk = gk[py, px] - gk_lr[qy, qx]
                    rg = float(dk @ dk) / (2 * sig_rg**2)
                    wgt = np.exp(-sp - rg)
                    num += wgt * lr[0, qy, qx]
                    den += wgt
            want[py, px] = num / (den + 1e-8)

    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-5, rtol=1e-4)
