"""Backbone export parity: a JAX Uni3FC state exported to a torch
state_dict (tools/export_backbone.py) must produce the SAME descriptors
when run through the reference's own `models.model.Uni3FC` forward
(pos-only path, CUDA deps stubbed — the tools/dynamics_parity.py harness).

This is the unit-level guarantee behind the checkpoint-level cross-eval
(tools/cross_eval_ref.py): if a random-init export matches the torch
forward to float tolerance, a trained checkpoint does too.

Reference structures: models/model.py:480-543 (Uni3FC __init__),
:97-123 (SA_Layer, tied q/k), :325-395 (N2PAttention / _DIM).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not available",
)


@pytest.mark.slow
def test_export_matches_reference_forward():
    import jax

    from dvmatcher_tpu.train import create_train_state, forward_features
    from tools.dynamics_parity import (
        install_ref_stubs,
        ref_forward_pos_only,
        ref_pos_encoding_cpu,
    )
    from tools.export_backbone import torch_state_dict

    n, k = 96, 8
    state, backbone, _, _ = create_train_state(
        jax.random.PRNGKey(3), n_points=n, feat_dim=None, k_backbone=k,
        k_deform=4, lr=1e-3, use_kernel=False,
    )
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(1, n, 3)).astype(np.float32)

    variables = {
        "params": state.params["backbone"],
        "batch_stats": state.batch_stats["backbone"],
    }
    ours = np.asarray(forward_features(backbone)(variables, xyz, None))

    sd = torch_state_dict(
        state.params["backbone"], state.batch_stats["backbone"]
    )

    install_ref_stubs()
    sys.path.insert(0, REF)
    from models.model import Uni3FC  # noqa: E402

    Uni3FC.pos_encoding_sin_wave = ref_pos_encoding_cpu
    Uni3FC.forward = ref_forward_pos_only
    model = Uni3FC(k=k)
    missing, unexpected = model.load_state_dict(
        {kk: torch.from_numpy(np.ascontiguousarray(v)) for kk, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    # only the unused-by-forward members may be missing: the 1152-d `conv`
    # projection (pos-only export) and SA_Layer's dead conv1/bn1
    for m in missing:
        assert (
            m.startswith("conv.") or m.startswith("bn.")
            or (m.startswith("sa") and (".conv1." in m or ".bn1." in m))
        ), f"unexpectedly missing: {m}"
    model.eval()

    with torch.no_grad():
        theirs, _ = model(torch.from_numpy(xyz).permute(0, 2, 1), None, None)
    theirs = theirs.numpy()

    assert theirs.shape == ours.shape
    # float32 accumulation-order differences only
    np.testing.assert_allclose(theirs, ours, atol=2e-3, rtol=1e-3)
