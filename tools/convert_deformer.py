"""Convert a reference Deformer checkpoint (ep_deformer_val_best.pth) to
dvmatcher_tpu flax params.

The reference ships trained deformer weights for scape_r, scape_partial and
shrec07_fourleg (ckpt/*/ep_deformer_val_best.pth — its only shipped
artifacts); this maps them onto models/deformer.Deformer:

  conv_layer.weight (1, k, 1, 1) -> neigh_weight (k, 1)
  conv_layer.bias   (1,)          -> neigh_bias (1,)
  deformation_decoder_layer.linear.{0,2,4,6}.{weight,bias}
      -> MLP Dense_{0..3} {kernel^T, bias}
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_deformer_state_dict(sd: dict) -> dict:
    """torch state dict -> flax params dict for models.deformer.Deformer."""

    def t2n(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    k = sd["conv_layer.weight"].shape[1]
    params = {
        "neigh_weight": t2n(sd["conv_layer.weight"]).reshape(1, k).T,  # (k, 1)
        "neigh_bias": t2n(sd["conv_layer.bias"]),
        "MLP_0": {},
    }
    mlp = {}
    for our_i, torch_i in enumerate((0, 2, 4, 6)):
        mlp[f"TorchDense_{our_i}"] = {
            "Dense_0": {
                "kernel": t2n(sd[f"deformation_decoder_layer.linear.{torch_i}.weight"]).T,
                "bias": t2n(sd[f"deformation_decoder_layer.linear.{torch_i}.bias"]),
            }
        }
    params["MLP_0"] = mlp
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference ep_deformer_*.pth")
    ap.add_argument("--out", required=True, help="output msgpack")
    args = ap.parse_args()
    import torch
    from flax import serialization

    sd = torch.load(args.ckpt, map_location="cpu")
    params = convert_deformer_state_dict(sd)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    print(f"[convert] wrote {args.out}")


if __name__ == "__main__":
    main()
