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


def main():
    from dvmatcher_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="scape_r")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--feature-dir", required=True)
    ap.add_argument("--corres-dir", default=None, help="directory of <name>.vts files")
    ap.add_argument("--out", default=None, help="optional json output path")
    args = ap.parse_args()
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
