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
    args = ap.parse_args()
    if args.synthetic:
        cfg = load_config(args.config)
        synthetic_eval(cfg, args.synthetic, args.ckpt_dir)
        return
    if not args.feature_dir:
        raise SystemExit("--feature-dir required (or use --synthetic)")
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
