"""Mean-geodesic-error benchmark harness.

Python port of the reference's MATLAB protocol (eval/main.m SCAPE block,
lines 1-43) and of `calculate_geodesic_error`
(misc/utils_geod.py:115-134):

For an ordered pair (src, tar):
  1. load the saved per-point descriptor fields phi_src, phi_tar
     (`usefeature_*.mat`, key 'uphi' — written by cli.test);
  2. take the rows of phi_src at the src shape's ground-truth landmark
     indices (`.vts` files, 1-indexed);
  3. nearest-neighbor search those rows against phi_tar -> predicted
     target indices;
  4. geodesic error per landmark = M_tar[predicted, gt_target_index],
     where M_tar is the target shape's precomputed geodesic matrix;
  5. report the mean over landmarks, and aggregate pairs by the
     off-diagonal mean (main.m `calculateAverage`).

This replaces the entire MATLAB harness (plus its `comp_geodesics_pairs`
C++ MEX) with numpy + the data.geodesics module.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def calculate_geodesic_error(
    dist_x: np.ndarray,
    corr_x: np.ndarray,
    corr_y: np.ndarray,
    p2p: np.ndarray,
    return_mean: bool = True,
):
    """Direct port of misc/utils_geod.py:115-134 (0-indexed inputs).

    dist_x: (Vx, Vx) geodesic matrix of shape x; corr_x/corr_y: ground-truth
    landmark indices on x and y; p2p: predicted y->x map."""
    errs = dist_x[corr_x, p2p[corr_y]]
    return errs.mean() if return_mean else errs


def nn_search_np(feats_t: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """argmin_j ||queries_i - feats_t_j|| (MATLAB knnsearch K=1), 0-indexed."""
    d = (
        (queries**2).sum(-1, keepdims=True)
        - 2 * queries @ feats_t.T
        + (feats_t**2).sum(-1)[None]
    )
    return d.argmin(-1)


def pair_geodesic_error(
    phi_s: np.ndarray,
    phi_t: np.ndarray,
    vts_s: np.ndarray,
    vts_t: np.ndarray,
    m_t: np.ndarray,
) -> np.ndarray:
    """Per-landmark geodesic errors for one ordered pair (0-indexed vts)."""
    queries = phi_s[vts_s]
    pred = nn_search_np(phi_t, queries)
    return m_t[pred, vts_t]


def off_diagonal_mean(arr: np.ndarray) -> float:
    """main.m `calculateAverage`: mean of the off-diagonal entries."""
    n = arr.shape[0]
    mask = ~np.eye(n, dtype=bool)
    return float(arr[mask].mean())


def load_vts(path: str) -> np.ndarray:
    """.vts files are 1-indexed vertex lists -> return 0-indexed."""
    return np.loadtxt(path, dtype=np.int64).reshape(-1) - 1


def evaluate_feature_dir(
    feature_dir: str,
    names: list[str],
    vts: dict[str, np.ndarray],
    geodesic: dict[str, np.ndarray],
) -> tuple[np.ndarray, float]:
    """Run the full ordered-pair protocol over saved features.

    feature_dir: directory of usefeature_<name>.mat files;
    vts[name]: 0-indexed GT landmark indices; geodesic[name]: (V, V) matrix.
    Returns (error matrix (n, n), off-diagonal mean)."""
    import scipy.io as sio

    phis = {
        n: sio.loadmat(str(Path(feature_dir) / f"usefeature_{n}.mat"))["uphi"]
        for n in names
    }
    n = len(names)
    arr = np.zeros((n, n))
    for ti, tar in enumerate(names):
        for si, src in enumerate(names):
            if si == ti:
                continue
            errs = pair_geodesic_error(
                phis[src], phis[tar], vts[src], vts[tar], geodesic[tar]
            )
            arr[si, ti] = errs.mean()
    return arr, off_diagonal_mean(arr)


def euclidean_error(
    verts: "np.ndarray",
    faces: "np.ndarray",
    pred: "np.ndarray",
    gt: "np.ndarray",
) -> float:
    """Area-normalised mean euclidean map error (Tools/utils.py:348-354):
    mean ||Y[pred] - Y[gt]|| / sqrt(surface area of Y)."""
    import numpy as np

    v = np.asarray(verts, np.float64)
    f = np.asarray(faces, np.int64)
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum()
    d = v[np.asarray(pred)] - v[np.asarray(gt)]
    return float(np.mean(np.linalg.norm(d, axis=1)) / np.sqrt(area))
