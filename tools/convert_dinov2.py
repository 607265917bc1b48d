"""Convert DINOv2 / FeatUp torch checkpoints to dvmatcher_tpu flax params.

Usage:
    python tools/convert_dinov2.py --backbone dinov2_vits14.pth \
        [--featup featup_dinov2_ckpt.pth] --out dino_params.msgpack

This environment has no model-hub access, so checkpoints must be supplied
as local files (torch state_dicts). The converter maps:
  * DINOv2 ViT-S/14 backbone keys (cls_token, pos_embed, patch_embed,
    blocks.N.{norm1,attn.qkv,attn.proj,ls1,norm2,mlp.fc1,mlp.fc2,ls2}, norm)
    -> models.dino.vit.DinoV2ViT params;
  * FeatUp JBU upsampler keys -> models.dino.jbu.JBUStack params
    (best-effort; unmapped keys are listed loudly so structural gaps are
    explicit rather than silent).

Output: flax.serialization msgpack of {"vit": ..., "channel_norm": ...,
"jbu": ...} matching models.dino.lift.FeatureLifter's param tree.
"""

from __future__ import annotations

import argparse

import numpy as np


def t2j(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_vit(sd: dict) -> dict:
    """torch DINOv2 state dict -> flax DinoV2ViT param dict."""
    p: dict = {}
    p["cls_token"] = t2j(sd["cls_token"])
    p["pos_embed"] = t2j(sd["pos_embed"])
    p["patch_embed"] = {
        "kernel": t2j(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": t2j(sd["patch_embed.proj.bias"]),
    }

    def dense(prefix):
        return {
            "kernel": t2j(sd[f"{prefix}.weight"]).T,
            "bias": t2j(sd[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {"scale": t2j(sd[f"{prefix}.weight"]), "bias": t2j(sd[f"{prefix}.bias"])}

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        blk = f"blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": ln(f"{blk}.norm1"),
            "attn": {"qkv": dense(f"{blk}.attn.qkv"), "proj": dense(f"{blk}.attn.proj")},
            "ls1": {"gamma": t2j(sd[f"{blk}.ls1.gamma"])},
            "norm2": ln(f"{blk}.norm2"),
            "mlp_fc1": dense(f"{blk}.mlp.fc1"),
            "mlp_fc2": dense(f"{blk}.mlp.fc2"),
            "ls2": {"gamma": t2j(sd[f"{blk}.ls2.gamma"])},
        }
        i += 1
    p["norm"] = ln("norm")
    return p


def convert_featup_upsampler(sd: dict) -> tuple[dict, dict | None, list[str]]:
    """FeatUp JBU checkpoint -> (JBUStack params, ChannelNorm params,
    unmapped keys).

    Mapped torch-side layouts (either bare or under an `upsampler.`
    prefix), per stage i in 1..4:
      * `up{i}.range_proj.weight`/`bias` — 1x1 Conv2d (K, G, 1, 1) ->
        flax Dense kernel (G, K)
      * `up{i}.sigma_spatial` / `up{i}.log_sigma_spatial` -> log-domain
        `log_sigma_spatial` (ditto `..range`)
      * `fixup_proj.weight`/`bias` (possibly `fixup_proj.1.*` when wrapped
        in Sequential(Dropout, Conv)) -> `fixup_proj` Dense
      * top-level `norm.weight`/`norm.bias` (FeatUp ChannelNorm, a
        LayerNorm over channels) -> ChannelNorm params
    Unknown keys are returned loudly, never silently dropped."""
    sd = {k.removeprefix("upsampler."): v for k, v in sd.items()}
    out: dict = {}
    norm = None
    used: set = set()

    def take(k):
        used.add(k)
        return t2j(sd[k])

    for i in range(1, 5):
        stage: dict = {}
        w = f"up{i}.range_proj.weight"
        if w in sd:
            kern = take(w)
            if kern.ndim == 4:  # conv2d 1x1 (K, G, 1, 1)
                kern = kern[:, :, 0, 0].T
            stage["range_proj"] = {"kernel": kern}
            b = f"up{i}.range_proj.bias"
            if b in sd:
                stage["range_proj"]["bias"] = take(b)
        for name in ("spatial", "range"):
            if f"up{i}.log_sigma_{name}" in sd:
                stage[f"log_sigma_{name}"] = take(f"up{i}.log_sigma_{name}").reshape(())
            elif f"up{i}.sigma_{name}" in sd:
                stage[f"log_sigma_{name}"] = np.log(
                    np.abs(take(f"up{i}.sigma_{name}")) + 1e-12
                ).reshape(())
        if stage:
            out[f"up_{i}"] = stage
    for prefix in ("fixup_proj", "fixup_proj.1"):
        if f"{prefix}.weight" in sd:
            kern = take(f"{prefix}.weight")
            if kern.ndim == 4:
                kern = kern[:, :, 0, 0].T
            out["fixup_proj"] = {"kernel": kern}
            if f"{prefix}.bias" in sd:
                out["fixup_proj"]["bias"] = take(f"{prefix}.bias")
            break
    if "norm.weight" in sd:
        norm = {"norm": {"scale": take("norm.weight"), "bias": take("norm.bias")}}
    unmapped = [k for k in sd if k not in used]
    return out, norm, unmapped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", required=True, help="dinov2 vit-s/14 state_dict .pth")
    ap.add_argument("--featup", default=None, help="FeatUp jbu checkpoint .pth")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    from flax import serialization

    sd = torch.load(args.backbone, map_location="cpu")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    params = {"vit": convert_vit(sd)}

    if args.featup:
        fsd = torch.load(args.featup, map_location="cpu")
        if "state_dict" in fsd:
            fsd = fsd["state_dict"]
        jbu, norm, unmapped = convert_featup_upsampler(fsd)
        params["jbu"] = jbu
        if norm:
            params["channel_norm"] = norm
        if unmapped:
            print(f"[convert] WARNING: {len(unmapped)} unmapped FeatUp keys:")
            for k in unmapped[:40]:
                print("   ", k)

    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    print(f"[convert] wrote {args.out}")


if __name__ == "__main__":
    main()
