"""Geodesic-error benchmark CLI — the runnable replacement for the
reference's MATLAB harness (eval/main.m).

    python -m dvmatcher_tpu.cli.evaluate --config scape_r \
        --feature-dir result/<exp>/feature --corres-dir <root>/corres

Loads saved `usefeature_*.mat` descriptor fields, `.vts` ground-truth
landmark files (1-indexed), per-target geodesic matrices (from the
preprocessing cache, or recomputed from the meshes), and prints the error
matrix's off-diagonal mean — the paper's primary quality metric.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


from dvmatcher_tpu.data import read_off
from dvmatcher_tpu.data.geodesics import geodesics
from dvmatcher_tpu.evals import evaluate_feature_dir, load_vts
from dvmatcher_tpu.utils import load_config


def synthetic_eval(cfg, shape_path: str, ckpt_root: str, sigma: float = 0.01):
    """Quality metric without ground-truth .vts files: perturb one real
    shape (normal-direction noise + a random <=30-degree rotation, the
    reference's robustness protocol), match perturbed -> clean with the
    trained backbone, and report the mean geodesic error under the
    identity ground truth. Random descriptors score ~the shape diameter;
    a useful model scores far lower."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvmatcher_tpu.data.robustness import noise_along_normals, random_rotation
    from dvmatcher_tpu.evals import pair_geodesic_error
    from dvmatcher_tpu.train import checkpoint as ckpt
    from dvmatcher_tpu.train import create_train_state, forward_features

    verts, faces = read_off(shape_path)
    geo = geodesics(verts, faces)
    noisy = noise_along_normals(verts, faces, sigma)
    rot = random_rotation(rng=np.random.default_rng(0)).astype(np.float32)
    noisy = noisy @ rot

    template, backbone, _, _ = create_train_state(
        jax.random.PRNGKey(0),
        n_points=cfg["dataset"]["n_points"],
        feat_dim=int(cfg.get("feat_dim", 1152)) if cfg["with_dino"] else None,
        k_backbone=cfg["tpu"]["k_backbone"],
        use_kernel=jax.default_backend() == "tpu",
    )
    state = ckpt.restore(str(Path(ckpt_root) / cfg["expname"]), "ep_val_best", template)
    variables = {
        "params": state.params["backbone"],
        "batch_stats": state.batch_stats["backbone"],
    }
    fwd = forward_features(backbone)
    phi_clean = np.asarray(fwd(variables, jnp.asarray(verts)[None], None)[0])
    phi_noisy = np.asarray(fwd(variables, jnp.asarray(noisy)[None], None)[0])

    idx = np.arange(verts.shape[0])
    errs = pair_geodesic_error(phi_noisy, phi_clean, idx, idx, geo)
    rng = np.random.default_rng(1)
    rand = pair_geodesic_error(
        rng.normal(size=phi_noisy.shape).astype(np.float32),
        rng.normal(size=phi_clean.shape).astype(np.float32),
        idx, idx, geo,
    )
    print(
        f"[synthetic] {Path(shape_path).stem}: mean geodesic error "
        f"{errs.mean():.4f} (random-feature baseline {rand.mean():.4f}, "
        f"diameter {geo.max():.4f})"
    )
    return float(errs.mean()), float(rand.mean())


def partial_eval(
    feature_dir: str,
    bench_root: str,
    ids_dir: str,
    corres_dir: str | None = None,
) -> tuple[dict[str, float], float]:
    """Partial-to-full protocol over saved features (the file-based
    counterpart of tools/probe_partial.py; reference protocol:
    test_partial.py partial scans in shapes_test + eval/main.m FAUST-PV
    ground truth through per-view vertex-index files).

    Layout (tools/make_synth_partial.py): shapes_test holds the full
    template (first sorted name) plus crops named `<variant>_v<k>.off`;
    `ids/<crop>.txt` maps crop rows to full-variant vertex ids; `.vts`
    files give variant->template ground truth. Per crop: NN-search the
    crop's descriptors into the template's, read the error off the
    template's geodesic matrix at the GT target vertices."""
    import numpy as np
    import scipy.io as sio

    from dvmatcher_tpu.evals.geodesic_error import nn_search_np

    shapes_dir = Path(bench_root) / "shapes_test"
    corres = Path(corres_dir) if corres_dir else Path(bench_root) / "corres"
    names = sorted(p.stem for p in shapes_dir.glob("*.off"))
    template, crops = names[0], names[1:]

    verts_t, faces_t = read_off(str(shapes_dir / f"{template}.off"))
    geo_t = geodesics(verts_t, faces_t)
    phi_t = sio.loadmat(str(Path(feature_dir) / f"usefeature_{template}.mat"))["uphi"]
    vts_t = load_vts(str(corres / f"{template}.vts"))

    errs: dict[str, float] = {}
    for crop in crops:
        variant = crop.rsplit("_v", 1)[0]
        ids = np.loadtxt(Path(ids_dir) / f"{crop}.txt", dtype=np.int64).reshape(-1)
        vts_s = load_vts(str(corres / f"{variant}.vts"))
        # variant vertex -> template vertex (dense for the synth benchmark;
        # rows without a GT landmark are masked out for sparse datasets)
        gt_map = np.full(max(int(vts_s.max()) + 1, int(ids.max()) + 1), -1, np.int64)
        gt_map[vts_s] = vts_t
        tgt = gt_map[ids]
        valid = tgt >= 0
        phi_c = sio.loadmat(str(Path(feature_dir) / f"usefeature_{crop}.mat"))["uphi"]
        pred = nn_search_np(phi_t, phi_c[valid])
        errs[crop] = float(geo_t[pred, tgt[valid]].mean())
        print(f"[partial] {crop}: {errs[crop]:.4f}")
    avg = float(np.mean(list(errs.values())))
    print(f"mean partial->full geodesic error: {avg:.6f}")
    return errs, avg


def main():
    from dvmatcher_tpu.utils.config import enable_compilation_cache, select_platform

    select_platform()
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="scape_r")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--feature-dir", default=None)
    ap.add_argument("--corres-dir", default=None, help="directory of <name>.vts files")
    ap.add_argument("--out", default=None, help="optional json output path")
    ap.add_argument(
        "--synthetic", default=None, metavar="SHAPE.off",
        help="no-ground-truth robustness eval on one shape (noise+rotation, identity GT)",
    )
    ap.add_argument("--ckpt-dir", default="ckpt")
    ap.add_argument(
        "--partial-ids", default=None, metavar="IDS_DIR",
        help="partial-to-full protocol: directory of <crop>.txt files "
        "mapping crop rows to full-variant vertex ids "
        "(tools/make_synth_partial.py layout)",
    )
    args = ap.parse_args()
    if args.synthetic:
        cfg = load_config(args.config)
        synthetic_eval(cfg, args.synthetic, args.ckpt_dir)
        return
    if not args.feature_dir:
        raise SystemExit("--feature-dir required (or use --synthetic)")
    if args.partial_ids:
        cfg = load_config(args.config)
        root = os.path.join(args.data_root, cfg["dataset"]["root_test"])
        errs, avg = partial_eval(
            args.feature_dir, root, args.partial_ids, args.corres_dir
        )
        if args.out:
            with open(args.out, "w") as f:
                json.dump(
                    {"mean_geodesic_error": avg, "per_crop": errs}, f
                )
        return
    cfg = load_config(args.config)
    ds = cfg["dataset"]
    root = os.path.join(args.data_root, ds["root_test"])
    corres = args.corres_dir or os.path.join(root, "corres")

    shapes_dir = Path(root) / "shapes_test"
    names = sorted(p.stem for p in shapes_dir.glob("*.off"))
    vts, geo = {}, {}
    for n in names:
        vts_path = Path(corres) / f"{n}.vts"
        if not vts_path.exists():
            raise SystemExit(
                f"missing ground-truth landmarks {vts_path} — the .vts files "
                "are dataset-release artifacts (see reference README)"
            )
        vts[n] = load_vts(str(vts_path))
        verts, faces = read_off(str(shapes_dir / f"{n}.off"))
        geo[n] = geodesics(verts, faces)
        print(f"[geo] {n}")

    arr, avg = evaluate_feature_dir(args.feature_dir, names, vts, geo)
    print(f"mean geodesic error (off-diagonal): {avg:.6f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"mean_geodesic_error": avg, "matrix": arr.tolist()}, f)


if __name__ == "__main__":
    main()
