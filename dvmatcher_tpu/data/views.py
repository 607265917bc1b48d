"""Partial-view generation: 12 icosahedron-direction visibility crops.

Port of the reference preprocessing (misc/scirpts/dataset_preprocess_pv.py
+ cal_ico.py): build the 12 icosahedron-vertex rotations, rotate the mesh's
vertex normals by each, and keep vertices whose rotated normal has z > 0.
Index files are written in the reference's `index_partial/index_<name>_
view_<v>.txt` format so existing datasets interoperate both ways.

Note: cal_ico.rotation_matrix applies Rodrigues with the UN-normalised
axis a x b (cal_ico.py:18-33) — not a proper rotation. The shipped
`index_partial` files were produced by exactly that formula, so it is
replicated verbatim for protocol parity.
"""

from __future__ import annotations

from itertools import product
from pathlib import Path

import numpy as np


def icosahedron_vertices() -> np.ndarray:
    g = (np.sqrt(5) - 1) / 2
    pt2 = [(a, b) for a, b in product([1, -1], [g, -g])]
    pts = [(a, b, 0) for a, b in pt2]
    pts += [(0, a, b) for a, b in pt2]
    pts += [(b, 0, a) for a, b in pt2]
    return np.array(pts, np.float64)


def _reference_rotation(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """cal_ico.py:13-34 verbatim (including the unnormalised-axis quirk)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    theta = np.arccos(np.clip(np.dot(a, b), -1, 1))
    vx, vy, vz = v
    r = np.array([[0, -vz, vy], [vz, 0, -vx], [-vy, vx, 0]])
    eye = np.eye(3)
    return np.cos(theta) * eye + (1 - np.cos(theta)) * np.outer(v, v) + np.sin(theta) * r


def icosahedron_rotations() -> list[np.ndarray]:
    """12 matrices aligning each icosahedron vertex direction with +z."""
    return [_reference_rotation(v, np.array([0.0, 0.0, 1.0])) for v in icosahedron_vertices()]


def compute_vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (misc/utils.py:20-43)."""
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    fn = fn / np.linalg.norm(fn, axis=-1, keepdims=True).clip(1e-12)
    vn = np.zeros_like(verts)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    return vn / np.linalg.norm(vn, axis=-1, keepdims=True).clip(1e-12)


def partial_view_indices(
    verts: np.ndarray, faces: np.ndarray
) -> list[np.ndarray]:
    """12 per-view visible-vertex index lists (normals' rotated z > 0)."""
    normals = compute_vertex_normals(verts, faces)
    out = []
    for rot in icosahedron_rotations():
        rotated = normals @ rot.astype(normals.dtype)
        out.append(np.where(rotated[:, 2] > 0)[0])
    return out


def write_view_indices(out_dir: str, name: str, views: list[np.ndarray]) -> None:
    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    for i, idx in enumerate(views):
        np.savetxt(d / f"index_{name}_view_{i + 1}.txt", idx, fmt="%i")


def read_view_indices(partial_dir: str, name: str, view: int) -> np.ndarray:
    return np.loadtxt(
        Path(partial_dir) / f"index_{name}_view_{view}.txt", dtype=np.int64
    ).reshape(-1)
