"""Build the partial-to-full aligned-GT file benchmark.

The reference's partial file protocol (test_partial.py + eval/main.m
FAUST-PV section) evaluates features computed on PARTIAL scans that live
directly in `shapes_test` against a full template, with ground truth
recovered through per-view vertex-index files — this environment ships no
partial GT dataset, so this script synthesizes one from the aligned-GT
synth benchmark (`data/scape_synth`, tools/make_synth_gt.py):

  shapes_test/synth000.off           the full template (copied, with faces)
  shapes_test/<variant>_v<k>.off     icosahedron-visibility crops of the
                                     other variants, FPS-2200 (the
                                     scape_partial crop recipe —
                                     dataset_preprocess_pv.py:64-96 +
                                     dataset_partial.py:252-254)
  ids/<variant>_v<k>.txt             crop row -> full-variant vertex id
  corres/<variant>.vts               dense GT maps (copied)

`cli.test --config scape_synth_partial` then runs the partial
template-to-all protocol over this layout, and
`cli.evaluate --partial-ids data/scape_synth_partial/ids` scores it.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import numpy as np
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvmatcher_tpu.data import read_off  # noqa: E402
from dvmatcher_tpu.data.dataset import fps_numpy  # noqa: E402
from dvmatcher_tpu.data.off_io import write_off_points  # noqa: E402
from dvmatcher_tpu.data.views import partial_view_indices  # noqa: E402

N_PARTIAL = 2200
VIEWS = (1, 4, 7, 10)  # four spread-out views of the icosahedron's 12


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="data/scape_synth")
    ap.add_argument("--out", default="data/scape_synth_partial")
    ap.add_argument("--n-partial", type=int, default=N_PARTIAL)
    args = ap.parse_args()

    src = Path(args.src)
    out = Path(args.out)
    (out / "shapes_test").mkdir(parents=True, exist_ok=True)
    (out / "ids").mkdir(exist_ok=True)
    (out / "corres").mkdir(exist_ok=True)

    names = sorted(p.stem for p in (src / "shapes_test").glob("*.off"))
    template = names[0]
    shutil.copy(src / "shapes_test" / f"{template}.off",
                out / "shapes_test" / f"{template}.off")
    for n in names:
        shutil.copy(src / "corres" / f"{n}.vts", out / "corres" / f"{n}.vts")

    n_crops = 0
    for n in names[1:]:
        verts, faces = read_off(str(src / "shapes_test" / f"{n}.off"))
        views = partial_view_indices(verts, faces)
        for vi in VIEWS:
            idx = views[vi - 1]
            if idx.shape[0] <= args.n_partial:
                print(f"[skip] {n} view {vi}: only {idx.shape[0]} visible")
                continue
            fps = fps_numpy(verts[idx], args.n_partial)
            ids = idx[fps]
            crop = f"{n}_v{vi:02d}"
            write_off_points(str(out / "shapes_test" / f"{crop}.off"),
                             verts[ids])
            np.savetxt(out / "ids" / f"{crop}.txt", ids, fmt="%i")
            n_crops += 1
    print(f"[make_synth_partial] template {template} + {n_crops} crops -> {out}")


if __name__ == "__main__":
    main()
