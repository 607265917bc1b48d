"""Checkpoint-level parity: the reference's SHIPPED trained Deformer weights
(ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth) converted to flax must
reproduce a torch oracle of the documented forward (models/model.py:454-478)
to float tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dvmatcher_tpu.models import Deformer
from dvmatcher_tpu.match import soft_correspondence
from dvmatcher_tpu.ops import knn_idx, index_points
from tools.convert_deformer import convert_deformer_state_dict

CKPT = "/root/reference/ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth"


def _torch_oracle(sd, f1c, f2c, verts1, verts12, pi, nodes):
    """Replicates the documented Deformer math with the loaded weights."""
    w = sd["conv_layer.weight"][0, :, 0, 0]  # (k,)
    b = sd["conv_layer.bias"][0]
    f1 = torch.einsum("bnkc,k->bnc", f1c, w) + b
    f2 = torch.einsum("bnkc,k->bnc", f2c, w) + b
    f2 = torch.matmul(pi, f2)

    def gather(x, idx):
        return torch.stack([x[i][idx[i]] for i in range(x.shape[0])])

    inp = torch.cat(
        [gather(verts1, nodes), gather(f1, nodes), gather(verts12, nodes), gather(f2, nodes)],
        dim=-1,
    )
    x = inp
    for i in (0, 2, 4):
        x = torch.nn.functional.elu(
            x @ sd[f"deformation_decoder_layer.linear.{i}.weight"].T
            + sd[f"deformation_decoder_layer.linear.{i}.bias"]
        )
    x = (
        x @ sd["deformation_decoder_layer.linear.6.weight"].T
        + sd["deformation_decoder_layer.linear.6.bias"]
    )
    return x


def test_shipped_deformer_checkpoint_parity(rng):
    sd = torch.load(CKPT, map_location="cpu")
    params = convert_deformer_state_dict(sd)

    b, n, m2, k, c, mn = 1, 48, 48, 10, 128, 24
    feat1 = rng.normal(size=(b, n, c)).astype(np.float32)
    feat2 = rng.normal(size=(b, m2, c)).astype(np.float32)
    verts1 = rng.normal(size=(b, n, 3)).astype(np.float32)
    verts2 = rng.normal(size=(b, m2, 3)).astype(np.float32)
    nodes = rng.choice(n, size=(b, mn), replace=False).astype(np.int64)

    pi = np.asarray(
        soft_correspondence(jnp.asarray(feat1), jnp.asarray(feat2), 50.0)
    )
    verts12 = pi @ verts2
    idx11 = np.asarray(knn_idx(jnp.asarray(verts1), jnp.asarray(verts1), k, exact=True))
    idx22 = np.asarray(knn_idx(jnp.asarray(verts2), jnp.asarray(verts2), k, exact=True))
    f1c = np.asarray(index_points(jnp.asarray(feat1), jnp.asarray(idx11)))
    f2c = np.asarray(index_points(jnp.asarray(feat2), jnp.asarray(idx22)))

    model = Deformer(k=k)
    ours = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(f1c), jnp.asarray(f2c), jnp.asarray(verts1),
            jnp.asarray(verts12), jnp.asarray(pi), jnp.asarray(nodes),
        )
    )

    want = _torch_oracle(
        sd,
        *(torch.tensor(t) for t in (f1c, f2c, verts1, verts12, pi)),
        torch.tensor(nodes),
    ).numpy()

    np.testing.assert_allclose(ours, want, atol=2e-4, rtol=1e-3)
    assert np.abs(want).max() > 0.01  # the checkpoint actually does something
