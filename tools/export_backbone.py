"""Export a trained JAX Uni3FC backbone to a torch state_dict for the
reference's own `models.model.Uni3FC` (inverse direction of
tools/convert_deformer.py).

Purpose (VERDICT r3 "what's missing" #5): certify END-TO-END parity at the
checkpoint level — run a full-scale repo-trained backbone through the
reference's own forward + argmin-search inference path (test.py:95-133,
CUDA deps stubbed) on the synth benchmark and compare the mean geodesic
error to this repo's own `cli.test -> cli.evaluate` chain. See
tools/cross_eval_ref.py for the consumer.

Layer mapping (this repo -> reference models/model.py:480-543):
  ConvBN_0 [+ConvBN_1]      -> conv0 (pos-only) / conv + conv0 (anchored)
  n2p_1..4 / n2p_5..7       -> n2p_attention1..4 / 5..7 (the _DIM variant)
  sa_1..4                   -> sa1..4 (tied q/k weights, model.py:106)
  conv1..conv6              -> conv1..conv6
Each ConvBN is TorchDense (kernel stored (in, out)) + flax BatchNorm; the
torch side is Conv1d/Conv2d (out, in, 1[, 1]) + BatchNorm1d, so kernels
transpose and gain trailing singleton dims. The reference's SA_Layer also
owns a conv1/bn1 member that its forward never uses (model.py:100-103) —
it is left at torch init and reported in `missing`, which is expected.

Usage:
    python tools/export_backbone.py --exp ckpt/dvmatcher_scape_r_distonly \
        --tag ep_val_best --out /tmp/backbone_distonly.pt [--feat-dim 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def torch_state_dict(
    params: dict, batch_stats: dict, feat_dim: int | None = None
) -> dict[str, np.ndarray]:
    """Flax param/batch_stats trees -> reference Uni3FC state_dict arrays.

    Returns numpy arrays (torch-free so it is unit-testable without torch);
    callers wrap with torch.from_numpy. `feat_dim` not None means the
    backbone was built with an anchor-feature projection (with_dino
    configs): ConvBN_0 is the `conv` projection and ConvBN_1 is conv0.
    """
    sd: dict[str, np.ndarray] = {}

    def dense_kernel(tree) -> np.ndarray:
        return _np(tree["Dense_0"]["kernel"])

    def conv1d(tree) -> np.ndarray:  # (in, out) -> (out, in, 1)
        return dense_kernel(tree).T[:, :, None]

    def conv2d(tree) -> np.ndarray:  # (in, out) -> (out, in, 1, 1)
        return dense_kernel(tree).T[:, :, None, None]

    def bn(dst: str, p_tree, s_tree) -> None:
        b = p_tree["BatchNorm_0"]
        s = s_tree["BatchNorm_0"]
        sd[f"{dst}.weight"] = _np(b["scale"])
        sd[f"{dst}.bias"] = _np(b["bias"])
        sd[f"{dst}.running_mean"] = _np(s["mean"])
        sd[f"{dst}.running_var"] = _np(s["var"])
        sd[f"{dst}.num_batches_tracked"] = np.asarray(1, dtype=np.int64)

    def convbn(src: str, dst: str, top_bn: str | None = None) -> None:
        p, s = params[src], batch_stats[src]
        sd[f"{dst}.0.weight"] = conv1d(p["TorchDense_0"])
        bn(f"{dst}.1", p["BatchNorm_0"], s["BatchNorm_0"])
        if top_bn:  # reference shares the Sequential's BN as self.bn*
            bn(top_bn, p["BatchNorm_0"], s["BatchNorm_0"])

    def n2p(src: str, dst: str) -> None:
        p, s = params[src], batch_stats[src]
        sd[f"{dst}.q_conv.weight"] = conv2d(p["TorchDense_0"])
        sd[f"{dst}.k_conv.weight"] = conv2d(p["TorchDense_1"])
        sd[f"{dst}.v_conv.weight"] = conv2d(p["TorchDense_2"])
        bn(f"{dst}.bn1", p["BatchNorm_0"], s["BatchNorm_0"])
        sd[f"{dst}.ff.0.weight"] = conv1d(p["TorchDense_3"])
        sd[f"{dst}.ff.2.weight"] = conv1d(p["TorchDense_4"])
        bn(f"{dst}.bn2", p["BatchNorm_1"], s["BatchNorm_1"])

    def sa(src: str, dst: str) -> None:
        p, s = params[src], batch_stats[src]
        qk = conv1d(p["TorchDense_0"])  # tied q/k (model.py:106)
        sd[f"{dst}.q_conv.weight"] = qk
        sd[f"{dst}.k_conv.weight"] = qk
        sd[f"{dst}.v_conv.weight"] = conv1d(p["TorchDense_1"])
        sd[f"{dst}.v_conv.bias"] = dense_kernel_bias(p["TorchDense_1"])
        sd[f"{dst}.trans_conv.weight"] = conv1d(p["TorchDense_2"])
        sd[f"{dst}.trans_conv.bias"] = dense_kernel_bias(p["TorchDense_2"])
        bn(f"{dst}.after_norm", p["BatchNorm_0"], s["BatchNorm_0"])

    def dense_kernel_bias(tree) -> np.ndarray:
        return _np(tree["Dense_0"]["bias"])

    if feat_dim is not None:
        convbn("ConvBN_0", "conv", top_bn="bn")
        convbn("ConvBN_1", "conv0", top_bn="bn0")
    else:
        convbn("ConvBN_0", "conv0", top_bn="bn0")
    for i in range(1, 8):
        n2p(f"n2p_{i}", f"n2p_attention{i}")
    for i in range(1, 5):
        sa(f"sa_{i}", f"sa{i}")
    for i in range(1, 7):
        convbn(f"conv{i}", f"conv{i}", top_bn=f"bn{i}")
    return sd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, help="orbax experiment dir")
    ap.add_argument("--tag", default="ep_val_best")
    ap.add_argument("--out", required=True, help="torch .pt output path")
    ap.add_argument(
        "--feat-dim", type=int, default=None,
        help="anchor feature dim when the checkpoint is a with_dino config "
        "(e.g. 128 for scape_r_wks)",
    )
    args = ap.parse_args()

    import jax
    import torch

    from dvmatcher_tpu.train import checkpoint as ckpt
    from dvmatcher_tpu.train import create_train_state

    # param shapes are n_points-independent; a small template keeps the
    # CPU-side init cheap (the full-size init traces a 5k-point forward)
    template, _, _, _ = create_train_state(
        jax.random.PRNGKey(0), n_points=256, feat_dim=args.feat_dim,
        k_backbone=40, use_kernel=False,
    )
    state = ckpt.restore(args.exp, args.tag, template)
    sd = torch_state_dict(
        state.params["backbone"], state.batch_stats["backbone"],
        feat_dim=args.feat_dim,
    )
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, args.out)
    print(f"[export] {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
