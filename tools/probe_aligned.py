"""Per-checkpoint ALIGNED-ground-truth probe (the VERDICT r2 experiment).

Usage: python tools/probe_aligned.py [--exp ckpt/dvmatcher_scape_r_nodino]
           [--bench data/scape_synth] [ep_1 ep_2 ... ep_val_best]

For each checkpoint tag: compute descriptors for every synth variant
(full vertex resolution), run the reference .vts protocol over all
ordered variant pairs (evals.evaluate_feature_dir semantics, in memory),
print the off-diagonal mean geodesic error. Baselines printed once:
  * xyz-NN   — match by raw coordinates (what a degenerate descriptor
               equal to the input would score; the warp makes this bad);
  * random   — random descriptors (≈ shape diameter scale).

This is the aligned analogue of tools/probe_quality.py's noise probe: it
measures what the reference's Table-1 metric measures (in-distribution
non-rigid matching), not noise invariance.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    exp = "ckpt/dvmatcher_scape_r_nodino"
    bench = "data/scape_synth"
    wks_dim = 0
    for i, a in enumerate(sys.argv[1:]):
        if a == "--exp":
            exp = sys.argv[2 + i]
        if a == "--bench":
            bench = sys.argv[2 + i]
        if a == "--wks":
            # probe a WKS-anchored checkpoint (configs/scape_r_wks.yaml):
            # feed per-variant WKS anchor features of this width
            wks_dim = int(sys.argv[2 + i])
    bf16 = "--bf16" in sys.argv[1:]
    tags = [a for a in args if a.startswith("ep")] or [
        "ep_1", "ep_5", "ep_10", "ep_val_best"
    ]

    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.data import read_off
    from dvmatcher_tpu.data.geodesics import geodesics
    from dvmatcher_tpu.evals import (
        load_vts,
        off_diagonal_mean,
        pair_geodesic_error,
    )
    from dvmatcher_tpu.train import checkpoint as ckpt
    from dvmatcher_tpu.train import create_train_state, forward_features

    shapes_dir = Path(bench) / "shapes_test"
    names = sorted(p.stem for p in shapes_dir.glob("*.off"))
    if not names:
        raise SystemExit(f"no shapes in {shapes_dir} — run tools/make_synth_gt.py")
    shapes = {n: read_off(str(shapes_dir / f"{n}.off")) for n in names}
    vts = {n: load_vts(str(Path(bench) / "corres" / f"{n}.vts")) for n in names}
    geo_cache = str(Path(bench) / "geo_cache.npz")
    if os.path.exists(geo_cache):
        geo = dict(np.load(geo_cache))
    else:
        geo = {n: geodesics(*shapes[n]).astype(np.float32) for n in names}
        np.savez(geo_cache, **geo)

    def protocol(phi: dict) -> float:
        k = len(names)
        arr = np.zeros((k, k))
        for ti, tar in enumerate(names):
            for si, src in enumerate(names):
                if si != ti:
                    arr[si, ti] = pair_geodesic_error(
                        phi[src], phi[tar], vts[src], vts[tar], geo[tar]
                    ).mean()
        return off_diagonal_mean(arr)

    # baselines
    print(f"[bench] {len(names)} variants, diameter {geo[names[0]].max():.3f}")
    xyz_phi = {n: shapes[n][0] for n in names}
    print(f"xyz-NN baseline:  {protocol(xyz_phi):.4f}")
    rng = np.random.default_rng(0)
    rand_phi = {
        n: rng.normal(size=(len(shapes[n][0]), 128)).astype(np.float32)
        for n in names
    }
    print(f"random baseline:  {protocol(rand_phi):.4f}")

    anchor = {}
    if wks_dim:
        from dvmatcher_tpu.spectral.wks import wks_descriptors

        for n in names:
            anchor[n] = jnp.asarray(
                wks_descriptors(*shapes[n], num_e=wks_dim)
            )[None]
        wks_phi = {n: np.asarray(anchor[n][0]) for n in names}
        print(f"wks-NN baseline:  {protocol(wks_phi):.4f}")

    template, backbone, _, _ = create_train_state(
        jax.random.PRNGKey(0), n_points=4995,
        feat_dim=wks_dim or None, k_backbone=40,
        use_kernel=jax.default_backend() == "tpu",
        dtype=jnp.bfloat16 if bf16 else None,  # --bf16: mixed-precision fwd
    )
    fwd = forward_features(backbone)
    for tag in tags:
        state = ckpt.restore(exp, tag, template)
        variables = {
            "params": state.params["backbone"],
            "batch_stats": state.batch_stats["backbone"],
        }
        phi = {}
        for n in names:
            v = shapes[n][0]
            phi[n] = np.asarray(
                fwd(variables, jnp.asarray(v)[None], anchor.get(n))[0]
            )
        print(f"{tag}: aligned mean geodesic error {protocol(phi):.4f}", flush=True)


if __name__ == "__main__":
    main()
