"""Partial-matching quality probe on the synthesized aligned-GT benchmark.

The reference's partial protocol (test_partial.py + SHREC16 .vts) matches
partial views against full shapes and scores mean geodesic error; this
environment ships no partial GT, so this probe synthesizes it: crop a
12-view partial (data/views.py icosahedron visibility + FPS-2200, the
scape_partial pipeline's exact crop recipe) of each scape_synth variant
and match it against the FULL other variants — GT comes from the
variants' .vts maps, errors from the target's geodesic matrix
(evals/geodesic_error.py protocol).

Usage:
  python tools/probe_partial.py [--exp ckpt/dvmatcher_scape_partial_tpu]
      [ep_1 ep_5 ... ep_val_best]
Prints xyz-NN / random baselines once, then the mean partial->full
aligned geodesic error per checkpoint tag.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PARTIAL = 2200
VIEWS = (1, 4, 7, 10)  # four spread-out views of the icosahedron's 12


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    exp = "ckpt/dvmatcher_scape_partial_tpu"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--exp":
            exp = sys.argv[2 + i]
    tags = [a for a in args if a.startswith("ep")] or ["ep_val_best"]

    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.data import read_off
    from dvmatcher_tpu.data.dataset import fps_numpy
    from dvmatcher_tpu.data.views import partial_view_indices
    from dvmatcher_tpu.evals import load_vts
    from dvmatcher_tpu.train import checkpoint as ckpt
    from dvmatcher_tpu.train import create_train_state, forward_features

    bench = Path("data/scape_synth")
    names = sorted(p.stem for p in (bench / "shapes_test").glob("*.off"))
    shapes = {n: read_off(str(bench / "shapes_test" / f"{n}.off")) for n in names}
    vts = {n: load_vts(str(bench / "corres" / f"{n}.vts")) for n in names}
    geo = dict(np.load(bench / "geo_cache.npz"))

    # partial crops: per shape, per chosen view -> (crop xyz, full-vertex ids)
    crops: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
    for n in names:
        v, f = shapes[n]
        crops[n] = []
        views = partial_view_indices(v, f)
        for vi in VIEWS:
            idx = views[vi - 1]
            if idx.shape[0] <= N_PARTIAL:
                continue
            fps = fps_numpy(v[idx], N_PARTIAL)
            crops[n].append((v[idx][fps].astype(np.float32), idx[fps]))

    def protocol(crop_phi, full_phi) -> float:
        """crop_phi[n]: list of (C, feat) aligned with crops[n];
        full_phi[n]: (V, feat)."""
        errs = []
        for s in names:
            # gt map: vertex on s -> vertex on t
            for t in names:
                if s == t:
                    continue
                gt = np.empty(len(shapes[s][0]), np.int64)
                gt[vts[s]] = vts[t]
                ft = full_phi[t]
                for (xyz_c, ids_c), phi_c in zip(crops[s], crop_phi[s]):
                    d = (
                        (phi_c**2).sum(-1, keepdims=True)
                        - 2 * phi_c @ ft.T
                        + (ft**2).sum(-1)[None]
                    )
                    pred = d.argmin(-1)
                    errs.append(geo[t][pred, gt[ids_c]].mean())
        return float(np.mean(errs))

    xyz_crop = {n: [c[0] for c in crops[n]] for n in names}
    xyz_full = {n: shapes[n][0].astype(np.float32) for n in names}
    print(f"[bench] {len(names)} variants, {sum(len(c) for c in crops.values())} crops")
    print(f"xyz-NN baseline:  {protocol(xyz_crop, xyz_full):.4f}")
    rng = np.random.default_rng(0)
    rand_crop = {
        n: [rng.normal(size=(len(c[0]), 128)).astype(np.float32) for c in crops[n]]
        for n in names
    }
    rand_full = {
        n: rng.normal(size=(len(shapes[n][0]), 128)).astype(np.float32)
        for n in names
    }
    print(f"random baseline:  {protocol(rand_crop, rand_full):.4f}")

    template, backbone, _, _ = create_train_state(
        jax.random.PRNGKey(0), n_points=N_PARTIAL, feat_dim=None,
        k_backbone=40, use_kernel=jax.default_backend() == "tpu",
    )
    fwd = forward_features(backbone)
    for tag in tags:
        state = ckpt.restore(exp, tag, template)
        variables = {
            "params": state.params["backbone"],
            "batch_stats": state.batch_stats["backbone"],
        }
        crop_phi = {
            n: [np.asarray(fwd(variables, jnp.asarray(x)[None], None)[0])
                for x, _ in crops[n]]
            for n in names
        }
        full_phi = {
            n: np.asarray(
                fwd(variables, jnp.asarray(shapes[n][0], jnp.float32)[None], None)[0]
            )
            for n in names
        }
        print(
            f"{tag}: partial->full aligned mean geodesic error "
            f"{protocol(crop_phi, full_phi):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
