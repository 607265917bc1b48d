"""Partial-to-full FILE-chain benchmark: generator + evaluate protocol.

Covers the file-based counterpart of tools/probe_partial.py (reference
protocol: test_partial.py keeps partial scans directly in shapes_test;
eval/main.m FAUST-PV recovers GT through per-view vertex-index files):

  tools/make_synth_partial.py  -> benchmark layout (template + crops + ids)
  cli.train.ensure_cache       -> the loader path cli.test drives
  cli.evaluate.partial_eval    -> zero error on perfect features, positive
                                  on corrupted ones (numpy oracle)
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import scipy.io as sio

from dvmatcher_tpu.cli.evaluate import partial_eval
from dvmatcher_tpu.data.off_io import write_off_mesh

NSIDE = 12  # 144-vertex grid: big enough for >40-vertex visibility crops


def _grid_mesh(seed: int):
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(NSIDE, dtype=np.float32),
                         np.arange(NSIDE, dtype=np.float32))
    verts = np.stack(
        [xs.ravel(), ys.ravel(),
         0.1 * rng.standard_normal(NSIDE * NSIDE).astype(np.float32)], 1
    )
    faces = []
    for r in range(NSIDE - 1):
        for c in range(NSIDE - 1):
            a = r * NSIDE + c
            faces.append((a, a + 1, a + NSIDE))
            faces.append((a + 1, a + NSIDE + 1, a + NSIDE))
    return verts, np.asarray(faces, np.int64)


@pytest.fixture(scope="module")
def bench(tmp_path_factory):
    """Tiny synth-style source dataset + generated partial benchmark."""
    root = tmp_path_factory.mktemp("synthsrc")
    (root / "shapes_test").mkdir()
    (root / "corres").mkdir()
    verts, faces = _grid_mesh(0)
    n = verts.shape[0]
    rng = np.random.default_rng(1)
    perms = {"synth000": np.arange(n)}
    write_off_mesh(str(root / "shapes_test" / "synth000.off"), verts, faces)
    np.savetxt(root / "corres" / "synth000.vts", np.arange(n) + 1, fmt="%i")
    for k in (1, 2):
        perm = rng.permutation(n)
        name = f"synth00{k}"
        perms[name] = perm
        inv = np.argsort(perm)
        # variant vertex j corresponds to template vertex perm[j]; faces
        # re-indexed through the inverse permutation stay valid
        write_off_mesh(str(root / "shapes_test" / f"{name}.off"),
                       verts[perm], inv[faces])
        np.savetxt(root / "corres" / f"{name}.vts", inv + 1, fmt="%i")

    out = tmp_path_factory.mktemp("synthpartial")
    subprocess.run(
        [sys.executable, "tools/make_synth_partial.py",
         "--src", str(root), "--out", str(out), "--n-partial", "40"],
        check=True, cwd=str(Path(__file__).resolve().parent.parent),
    )
    return out, verts, perms


def test_generator_layout(bench):
    out, verts, perms = bench
    names = sorted(p.stem for p in (out / "shapes_test").glob("*.off"))
    assert names[0] == "synth000"
    crops = names[1:]
    assert crops, "generator produced no crops"
    for c in crops:
        ids = np.loadtxt(out / "ids" / f"{c}.txt", dtype=np.int64)
        assert ids.shape == (40,)
        variant = c.rsplit("_v", 1)[0]
        # crop points are exactly the selected variant vertices
        from dvmatcher_tpu.data import read_off

        pts, _ = read_off(str(out / "shapes_test" / f"{c}.off"))
        np.testing.assert_allclose(pts, verts[perms[variant]][ids], atol=1e-5)


def _write_features(out, perms, feature_dir, shift=0):
    """Perfect crop features = the template's rows at the GT vertices
    (optionally index-shifted to corrupt the map)."""
    n = next(iter(perms.values())).shape[0]
    rng = np.random.default_rng(2)
    phi_t = rng.normal(size=(n, 8)).astype(np.float32)
    feature_dir.mkdir(parents=True, exist_ok=True)
    sio.savemat(feature_dir / "usefeature_synth000.mat", {"uphi": phi_t})
    for p in (out / "ids").glob("*.txt"):
        crop = p.stem
        variant = crop.rsplit("_v", 1)[0]
        ids = np.loadtxt(p, dtype=np.int64)
        tpl_idx = perms[variant][ids]  # template vertex per crop row
        phi_c = phi_t[(tpl_idx + shift) % n]
        sio.savemat(feature_dir / f"usefeature_{crop}.mat", {"uphi": phi_c})


def test_partial_eval_perfect_zero(bench, tmp_path):
    out, _, perms = bench
    fdir = tmp_path / "feature"
    _write_features(out, perms, fdir)
    errs, avg = partial_eval(str(fdir), str(out), str(out / "ids"))
    assert avg == pytest.approx(0.0, abs=1e-7)
    assert all(e == pytest.approx(0.0, abs=1e-7) for e in errs.values())


def test_partial_eval_corrupted_positive(bench, tmp_path):
    out, _, perms = bench
    fdir = tmp_path / "feature"
    _write_features(out, perms, fdir, shift=3)
    _, avg = partial_eval(str(fdir), str(out), str(out / "ids"))
    assert avg > 0.1


def test_loader_path(bench):
    """The benchmark layout drives the same construction path cli.test
    uses for partial configs (ensure_cache -> load_split -> PairDataset
    with template-to-all combos)."""
    out, _, _ = bench
    from dvmatcher_tpu.cli.train import ensure_cache
    from dvmatcher_tpu.data import PairDataset, load_split
    from dvmatcher_tpu.data.pairs import template_to_all
    from dvmatcher_tpu.utils import load_config

    cfg = load_config("scape_synth_partial")
    cfg["dataset"]["root_train"] = out.name
    cfg["dataset"]["root_test"] = out.name
    cfg["dataset"]["cache_dir"] = "cache_test"
    cfg["dataset"]["n_points"] = 40
    cache = ensure_cache(cfg, str(out.parent), "test")
    records = load_split(cache, "test")
    assert records[0].name == "synth000"
    ds = PairDataset(records, mode="test", bucket_multiple=16,
                     combinations=template_to_all(len(records)))
    item = ds._shape(1)  # first crop
    assert item["n"] == 40
