"""Synthesized aligned-ground-truth benchmark (the `.vts` protocol without
dataset-release artifacts).

The reference's entire quality story is mean geodesic error against
`.vts` ground-truth landmark files (eval/main.m:1-43,
misc/utils_geod.py:115-134), but the `.vts` files are dataset-release
artifacts that ship with SCAPE_r/FAUST downloads, not with the code. This
module synthesizes a benchmark of the same *kind* from any single mesh:

  * template = a real test mesh (e.g. SCAPE_r mesh052);
  * variants = smooth random non-rigid warps of the template (Gaussian-RBF
    displacement fields blended partition-of-unity style), each with an
    independent random vertex permutation (so vertex ORDER carries no
    correspondence signal) and optionally a random rotation;
  * `.vts` files = the permutations, mapping template landmark l to its
    vertex index in each variant (1-indexed on disk, like the originals).

Every ordered variant pair then has exact ground-truth correspondence by
construction, and `cli.evaluate` / `evals.evaluate_feature_dir` run the
reference protocol unchanged: NN-search saved descriptors, index the
target's geodesic matrix at (predicted, gt), off-diagonal mean.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from dvmatcher_tpu.data.dataset import fps_numpy
from dvmatcher_tpu.data.off_io import read_off, write_off_mesh
from dvmatcher_tpu.data.robustness import noise_along_normals, random_rotation


def smooth_rbf_warp(
    verts: np.ndarray,
    rng: np.random.Generator,
    magnitude: float = 0.25,
    n_controls: int = 8,
    support: float = 0.35,
) -> np.ndarray:
    """Smooth random non-rigid displacement field.

    FPS-sampled control points get random displacement vectors of length
    uniform(0.5, 1)·magnitude·diameter; each vertex blends them with
    normalized Gaussian weights of width support·diameter. The
    partition-of-unity blend bounds every vertex's displacement by the
    largest control displacement, and the wide kernels keep the field
    locally near-rigid (neighboring vertices move together), i.e. a
    plausible pose-like deformation rather than noise."""
    v = np.asarray(verts, np.float64)
    diam = float(np.linalg.norm(v.max(0) - v.min(0)))
    ctrl = v[fps_numpy(v.astype(np.float32), n_controls, start=int(rng.integers(len(v))))]
    disp = rng.normal(size=(n_controls, 3))
    disp /= np.linalg.norm(disp, axis=1, keepdims=True)
    disp *= (rng.uniform(0.5, 1.0, size=(n_controls, 1)) * magnitude * diam)
    d2 = ((v[:, None] - ctrl[None]) ** 2).sum(-1)  # (N, n_controls)
    s = support * diam
    w = np.exp(-d2 / (2.0 * s * s))
    field = (w @ disp) / (w.sum(-1, keepdims=True) + 1e-12)
    return (v + field).astype(np.float32)


def make_variant(
    verts: np.ndarray,
    faces: np.ndarray,
    rng: np.random.Generator,
    magnitude: float = 0.25,
    rotate: bool = False,
    noise_sigma: float = 0.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One benchmark variant: warp (+ optional rotation/noise) + vertex
    permutation with faces remapped (the variant stays a valid mesh).

    Returns (verts_v, faces_v, vts) with vts[l] = index in the variant of
    template vertex l (0-indexed), i.e. verts_v[vts[l]] is template vertex
    l's deformed position."""
    warped = smooth_rbf_warp(verts, rng, magnitude=magnitude)
    if noise_sigma > 0:
        warped = noise_along_normals(warped, faces, noise_sigma, rng=rng)
    if rotate:
        warped = (warped @ random_rotation(rng=rng)).astype(np.float32)
    n = warped.shape[0]
    perm = rng.permutation(n)  # variant vertex i = template vertex perm[i]
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    verts_v = warped[perm]
    faces_v = inv[faces]
    return verts_v.astype(np.float32), faces_v, inv


def generate_synth_benchmark(
    template_off: str,
    out_root: str,
    n_variants: int = 6,
    seed: int = 0,
    magnitude: float = 0.25,
    rotate: bool = False,
    noise_sigma: float = 0.0,
) -> list[str]:
    """Write `<out_root>/shapes_test/synth00i.off` + `<out_root>/corres/
    synth00i.vts` (1-indexed, like the released files). synth000 is the
    unwarped template under an identity permutation — its variant pairs
    measure pure warp-matching; pairs among warped variants measure
    warp-to-warp matching (both are in the real protocol's spirit, where
    every test shape is a different pose). Returns the variant names."""
    verts, faces = read_off(template_off)
    if faces is None or len(faces) == 0:
        raise ValueError(f"{template_off} has no faces; need a mesh template")
    shapes_dir = Path(out_root) / "shapes_test"
    corres_dir = Path(out_root) / "corres"
    shapes_dir.mkdir(parents=True, exist_ok=True)
    corres_dir.mkdir(parents=True, exist_ok=True)
    # the train split is required by the preprocess/cache machinery; point
    # it at the same shapes (the benchmark only uses the test split)
    train_link = Path(out_root) / "shapes_train"
    train_link.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    names = []
    for i in range(n_variants):
        name = f"synth{i:03d}"
        if i == 0:
            vv, ff, vts = verts, faces, np.arange(len(verts))
        else:
            vv, ff, vts = make_variant(
                verts, faces, rng, magnitude=magnitude, rotate=rotate,
                noise_sigma=noise_sigma,
            )
        write_off_mesh(str(shapes_dir / f"{name}.off"), vv, ff)
        np.savetxt(corres_dir / f"{name}.vts", vts + 1, fmt="%i")
        names.append(name)
    return names
