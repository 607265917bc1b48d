"""Checkpoint-level cross-implementation evaluation (VERDICT r3 missing #5).

Runs a repo-trained backbone, exported to a torch state_dict by
tools/export_backbone.py, through the REFERENCE's own inference path —
`models.model.Uni3FC.forward` + the argmin NN search of test.py:19-28
(CUDA deps stubbed exactly as in tools/dynamics_parity.py) — over the
synthesized aligned-GT benchmark at full vertex resolution, and reports
the mean geodesic error under the same .vts protocol this repo's
`cli.test -> cli.evaluate` chain uses. Two matching numbers certify
end-to-end parity at the checkpoint level, not just at tiny-N dynamics.

Usage (CPU-only; export first):
    python tools/export_backbone.py --exp ckpt/dvmatcher_scape_r_distonly \
        --tag ep_val_best --out /tmp/backbone_distonly.pt
    python tools/cross_eval_ref.py --weights /tmp/backbone_distonly.pt \
        [--bench data/scape_synth] \
        [--compare result/dvmatcher_scape_r_distonly_scape_synth/geodesic_error.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help=".pt from export_backbone")
    ap.add_argument("--bench", default="data/scape_synth")
    ap.add_argument("--compare", default=None, help="this repo's eval JSON")
    ap.add_argument("--out", default=None, help="write a result JSON here")
    ap.add_argument(
        "--wks", type=int, default=0,
        help="checkpoint is WKS-anchored with this anchor dim: the "
        "reference's `conv` projection is resized from 1152 to it and the "
        "anchored forward branch (model.py:709-761) runs with per-variant "
        "WKS descriptors as dino_feat",
    )
    args = ap.parse_args()

    import torch

    from tools.dynamics_parity import (
        install_ref_stubs,
        ref_forward_pos_only,
        ref_forward_with_feat,
        ref_pos_encoding_cpu,
    )

    install_ref_stubs()
    sys.path.insert(0, "/root/reference")
    from models.model import Uni3FC  # noqa: E402
    import torch.nn as nn  # noqa: E402

    Uni3FC.pos_encoding_sin_wave = ref_pos_encoding_cpu
    Uni3FC.forward = ref_forward_with_feat if args.wks else ref_forward_pos_only

    model = Uni3FC(k=40)
    if args.wks:
        # the reference hardcodes the 1152-d DINO width (model.py:506);
        # resize the projection to the anchor width the checkpoint trained
        model.conv[0] = nn.Conv1d(args.wks, 384, kernel_size=1, bias=False)
    sd = torch.load(args.weights, map_location="cpu", weights_only=True)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # expected-missing: the `conv` projection (pos-only checkpoints) and
    # SA_Layer's conv1/bn1 members that the reference forward never touches
    # (model.py:100-103); anything else is a mapping bug.
    allowed = [
        k for k in missing
        if (not args.wks and k.startswith(("conv.", "bn.")))
        or (k.startswith("sa") and (".conv1." in k or ".bn1." in k))
    ]
    hard_missing = [k for k in missing if k not in allowed]
    print(f"[load] {len(sd)} tensors; missing={len(missing)} "
          f"(allowed {len(allowed)}), unexpected={len(unexpected)}")
    if hard_missing or unexpected:
        raise SystemExit(
            f"state_dict mapping bug: hard_missing={hard_missing[:8]} "
            f"unexpected={list(unexpected)[:8]}"
        )
    model.eval()

    from dvmatcher_tpu.data import read_off
    from dvmatcher_tpu.data.geodesics import geodesics
    from dvmatcher_tpu.evals import (
        load_vts,
        off_diagonal_mean,
        pair_geodesic_error,
    )

    shapes_dir = Path(args.bench) / "shapes_test"
    names = sorted(p.stem for p in shapes_dir.glob("*.off"))
    if not names:
        raise SystemExit(f"no shapes in {shapes_dir}")
    shapes = {n: read_off(str(shapes_dir / f"{n}.off")) for n in names}
    vts = {n: load_vts(str(Path(args.bench) / "corres" / f"{n}.vts")) for n in names}
    geo_cache = str(Path(args.bench) / "geo_cache.npz")
    if os.path.exists(geo_cache):
        geo = dict(np.load(geo_cache))
    else:
        geo = {n: geodesics(*shapes[n]).astype(np.float32) for n in names}
        np.savez(geo_cache, **geo)

    anchor = {}
    if args.wks:
        from dvmatcher_tpu.spectral.wks import wks_descriptors

        for n in names:
            t0 = time.time()
            anchor[n] = wks_descriptors(*shapes[n], num_e=args.wks)
            print(f"[wks] {n}: {anchor[n].shape} in {time.time() - t0:.1f}s",
                  flush=True)

    # reference inference: feats = model(verts.permute(0,2,1), dino_feat,
    # None) — test.py:103-104
    phi = {}
    for n in names:
        v = torch.from_numpy(shapes[n][0].astype(np.float32))[None]  # (1,N,3)
        feat = (
            torch.from_numpy(anchor[n].astype(np.float32))[None]
            if args.wks else None
        )
        t0 = time.time()
        with torch.no_grad():
            f, _ = model(v.permute(0, 2, 1), feat, None)
        phi[n] = f[0].numpy()
        print(f"[fwd] {n}: N={phi[n].shape[0]} in {time.time() - t0:.1f}s",
              flush=True)

    k = len(names)
    arr = np.zeros((k, k))
    for ti, tar in enumerate(names):
        for si, src in enumerate(names):
            if si != ti:
                # pair_geodesic_error performs the argmin NN search of
                # test.py:19-28 internally (knnsearch of main.m)
                arr[si, ti] = pair_geodesic_error(
                    phi[src], phi[tar], vts[src], vts[tar], geo[tar]
                ).mean()
    err = float(off_diagonal_mean(arr))
    print(f"[cross-eval] reference-pipeline mean geodesic error: {err:.4f}")

    ours = None
    if args.compare and os.path.exists(args.compare):
        ours = json.load(open(args.compare))["mean_geodesic_error"]
        print(f"[cross-eval] this repo's own chain:              {ours:.4f}")
        print(f"[cross-eval] |delta| = {abs(err - ours):.4f}")
    if args.out:
        json.dump(
            {"reference_pipeline_error": err, "repo_chain_error": ours,
             "weights": args.weights, "bench": args.bench},
            open(args.out, "w"), indent=1,
        )
        print(f"[cross-eval] wrote {args.out}")


if __name__ == "__main__":
    main()
