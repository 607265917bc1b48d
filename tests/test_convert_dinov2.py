"""Weight-converter test: a synthetic DINOv2-S/14-shaped torch state dict
maps onto the flax ViT and produces a working forward; numeric parity is
checked against a hand-rolled numpy oracle for one shallow block."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dvmatcher_tpu.models.dino.vit import DinoV2ViT
from tools.convert_dinov2 import convert_vit


def _synth_state_dict(depth=2, dim=384, grid=37):
    sd = {}
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd["cls_token"] = r(1, 1, dim)
    sd["pos_embed"] = r(1, grid * grid + 1, dim)
    sd["patch_embed.proj.weight"] = r(dim, 3, 14, 14)
    sd["patch_embed.proj.bias"] = r(dim)
    for i in range(depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = torch.ones(dim)
        sd[f"{b}.norm1.bias"] = r(dim)
        sd[f"{b}.attn.qkv.weight"] = r(3 * dim, dim)
        sd[f"{b}.attn.qkv.bias"] = r(3 * dim)
        sd[f"{b}.attn.proj.weight"] = r(dim, dim)
        sd[f"{b}.attn.proj.bias"] = r(dim)
        sd[f"{b}.ls1.gamma"] = torch.full((dim,), 1e-5)
        sd[f"{b}.norm2.weight"] = torch.ones(dim)
        sd[f"{b}.norm2.bias"] = r(dim)
        sd[f"{b}.mlp.fc1.weight"] = r(4 * dim, dim)
        sd[f"{b}.mlp.fc1.bias"] = r(4 * dim)
        sd[f"{b}.mlp.fc2.weight"] = r(dim, 4 * dim)
        sd[f"{b}.mlp.fc2.bias"] = r(dim)
        sd[f"{b}.ls2.gamma"] = torch.full((dim,), 1e-5)
    sd["norm.weight"] = torch.ones(dim)
    sd["norm.bias"] = r(dim)
    return sd


def test_convert_vit_loads_and_runs():
    sd = _synth_state_dict(depth=2)
    params = convert_vit(sd)
    vit = DinoV2ViT(depth=2)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    # init to get the expected tree, then swap in converted params
    template = vit.init(jax.random.PRNGKey(1), img)

    def shapes(t):
        return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)

    assert shapes(template["params"]) == shapes(params)
    out = vit.apply({"params": params}, img)
    assert out.shape == (1, 16, 16, 384)
    assert np.all(np.isfinite(np.asarray(out)))


def test_converted_patch_embed_matches_torch():
    """The patch embedding (conv) must agree numerically with torch."""
    sd = _synth_state_dict(depth=1)
    params = convert_vit(sd)
    img = np.random.default_rng(0).normal(size=(1, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        conv = torch.nn.Conv2d(3, 384, 14, 14)
        conv.weight.copy_(sd["patch_embed.proj.weight"])
        conv.bias.copy_(sd["patch_embed.proj.bias"])
        want = conv(torch.tensor(img).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    import flax.linen as nn

    class PE(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(384, (14, 14), strides=(14, 14), padding="VALID",
                           name="patch_embed")(x)

    got = PE().apply({"params": {"patch_embed": params["patch_embed"]}},
                     jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def _torch_block_forward(sd, prefix, x, dim=384, heads=6):
    """Manual torch DINOv2 block forward (LN->attn->LS residual, LN->MLP->LS
    residual) — the published DINOv2 architecture, written independently."""
    import torch.nn.functional as F

    def ln(t, w, b):
        return F.layer_norm(t, (dim,), sd[w], sd[b], eps=1e-6)

    y = ln(x, f"{prefix}.norm1.weight", f"{prefix}.norm1.bias")
    b_, n_, _ = y.shape
    qkv = y @ sd[f"{prefix}.attn.qkv.weight"].T + sd[f"{prefix}.attn.qkv.bias"]
    q, k, v = qkv.reshape(b_, n_, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    attn = torch.softmax(q @ k.transpose(-2, -1) / (dim // heads) ** 0.5, dim=-1)
    y = (attn @ v).transpose(1, 2).reshape(b_, n_, dim)
    y = y @ sd[f"{prefix}.attn.proj.weight"].T + sd[f"{prefix}.attn.proj.bias"]
    x = x + y * sd[f"{prefix}.ls1.gamma"]
    y = ln(x, f"{prefix}.norm2.weight", f"{prefix}.norm2.bias")
    y = F.gelu(y @ sd[f"{prefix}.mlp.fc1.weight"].T + sd[f"{prefix}.mlp.fc1.bias"])
    y = y @ sd[f"{prefix}.mlp.fc2.weight"].T + sd[f"{prefix}.mlp.fc2.bias"]
    return x + y * sd[f"{prefix}.ls2.gamma"]


def test_converted_block_matches_torch():
    """Full transformer block (LN + qkv attention + LayerScale + MLP)
    numeric parity: converted flax weights vs manual torch forward."""
    from dvmatcher_tpu.models.dino.vit import Block

    sd = _synth_state_dict(depth=1)
    params = convert_vit(sd)
    x = np.random.default_rng(1).normal(size=(2, 50, 384)).astype(np.float32)

    with torch.no_grad():
        want = _torch_block_forward(sd, "blocks.0", torch.tensor(x)).numpy()
    got = Block(384, 6).apply({"params": params["block_0"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_pos_embed_interpolation_matches_torch():
    """37x37 -> 16x16 bicubic pos-embed resize must match torch
    F.interpolate(mode='bicubic', align_corners=False) — the DINOv2
    interpolate_pos_encoding semantics (no antialias on downscale)."""
    import torch.nn.functional as F

    from dvmatcher_tpu.models.dino.vit import _interp_pos

    pos = np.random.default_rng(2).normal(size=(1, 37 * 37, 64)).astype(np.float32)
    with torch.no_grad():
        p = torch.tensor(pos).reshape(1, 37, 37, 64).permute(0, 3, 1, 2)
        want = (
            F.interpolate(p, size=(16, 16), mode="bicubic", align_corners=False)
            .permute(0, 2, 3, 1)
            .reshape(1, 256, 64)
            .numpy()
        )
    got = _interp_pos(jnp.asarray(pos), 37, 16, 16)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


def test_converted_vit_end_to_end_matches_torch():
    """Whole converted ViT (patch embed + cls/pos + blocks + final LN) vs a
    manual torch forward on a 224x224 image."""
    import torch.nn.functional as F

    depth = 2
    sd = _synth_state_dict(depth=depth)
    params = convert_vit(sd)
    img = np.random.default_rng(3).normal(size=(1, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        t = torch.tensor(img).permute(0, 3, 1, 2)
        x = F.conv2d(t, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
                     stride=14)
        x = x.flatten(2).transpose(1, 2)  # (1, 256, 384)
        pos = sd["pos_embed"][:, 1:].reshape(1, 37, 37, 384).permute(0, 3, 1, 2)
        pos = F.interpolate(pos, size=(16, 16), mode="bicubic",
                            align_corners=False)
        pos = pos.permute(0, 2, 3, 1).reshape(1, 256, 384)
        x = x + pos
        cls = sd["cls_token"] + sd["pos_embed"][:, :1]
        x = torch.cat([cls, x], dim=1)
        for i in range(depth):
            x = _torch_block_forward(sd, f"blocks.{i}", x)
        x = F.layer_norm(x, (384,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)
        want = x[:, 1:].reshape(1, 16, 16, 384).numpy()

    got = DinoV2ViT(depth=depth).apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_convert_featup_jbu_mapping():
    """FeatUp-layout JBU state dict maps onto the flax JBUStack tree: 1x1
    convs transpose to Dense kernels, sigmas land in log domain, the
    ChannelNorm LayerNorm maps, and nothing is silently dropped."""
    from flax.core import unfreeze

    from dvmatcher_tpu.models.dino.jbu import JBUStack
    from dvmatcher_tpu.models.dino.lift import ChannelNorm
    from tools.convert_dinov2 import convert_featup_upsampler

    g = torch.Generator().manual_seed(1)
    sd = {}
    for i in range(1, 5):
        sd[f"upsampler.up{i}.range_proj.weight"] = torch.randn(32, 3, 1, 1, generator=g)
        sd[f"upsampler.up{i}.range_proj.bias"] = torch.randn(32, generator=g)
        sd[f"upsampler.up{i}.sigma_spatial"] = torch.tensor([1.7])
        sd[f"upsampler.up{i}.log_sigma_range"] = torch.tensor([-0.3])
    sd["upsampler.fixup_proj.1.weight"] = torch.randn(384, 384, 1, 1, generator=g)
    sd["upsampler.fixup_proj.1.bias"] = torch.randn(384, generator=g)
    sd["norm.weight"] = torch.randn(384, generator=g)
    sd["norm.bias"] = torch.randn(384, generator=g)
    sd["some.unknown.key"] = torch.zeros(1)

    jbu, norm, unmapped = convert_featup_upsampler(sd)
    assert unmapped == ["some.unknown.key"]
    assert jbu["up_1"]["range_proj"]["kernel"].shape == (3, 32)
    np.testing.assert_allclose(
        jbu["up_2"]["log_sigma_spatial"], np.log(1.7), rtol=1e-6
    )
    np.testing.assert_allclose(jbu["up_3"]["log_sigma_range"], -0.3, rtol=1e-6)
    assert jbu["fixup_proj"]["kernel"].shape == (384, 384)

    # grafts onto the real module trees (keys + shapes line up); spatial
    # dims are irrelevant to the param tree, so keep them tiny for speed
    feats = jnp.zeros((1, 4, 4, 384))
    img = jnp.zeros((1, 64, 64, 3))
    template = unfreeze(JBUStack().init(jax.random.PRNGKey(0), feats, img))["params"]

    def tree_shapes(t):
        return {
            k: tree_shapes(v) if isinstance(v, dict) else tuple(np.shape(v))
            for k, v in t.items()
        }

    assert tree_shapes(template) == tree_shapes(jbu)
    tn = unfreeze(ChannelNorm().init(jax.random.PRNGKey(0), feats))["params"]
    assert tree_shapes(tn) == tree_shapes(norm)

    # 1x1-conv -> Dense transposition is numerically faithful
    x = np.random.default_rng(4).normal(size=(1, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch.nn.functional.conv2d(
            torch.tensor(x).permute(0, 3, 1, 2),
            sd["upsampler.up1.range_proj.weight"],
            sd["upsampler.up1.range_proj.bias"],
        ).permute(0, 2, 3, 1).numpy()
    import flax.linen as fnn

    got = fnn.Dense(32).apply(
        {"params": jbu["up_1"]["range_proj"]}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
