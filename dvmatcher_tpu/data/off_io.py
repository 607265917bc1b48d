"""OFF mesh/point-cloud IO.

Replaces the reference's potpourri3d `read_mesh` (dataset.py:168) and the
hand-rolled point reader (dataset.py:16-27) / writer (train.py:22-27).
Pure numpy; the native C++ fast path (dvm_native) is used when built.
"""

from __future__ import annotations

import numpy as np


def read_off(path: str) -> tuple[np.ndarray, np.ndarray | None]:
    """Read an OFF file -> (verts (N,3) f32, faces (M,3) i32 or None).

    Handles both `OFF\\n<counts>` and `OFF <counts>` headers and files with
    zero faces (pure point clouds). Uses the dvm_native C++ parser when
    built (~10x numpy.loadtxt); falls back to pure Python.
    """
    from dvmatcher_tpu.data import native

    if native.available():
        out = native.read_off(path)
        if out is not None:
            return out
    with open(path, "r") as f:
        tokens: list[str] = []
        header = f.readline().strip()
        if not header.startswith("OFF"):
            raise ValueError(f"{path}: not an OFF file (header {header!r})")
        rest = header[3:].strip()
        if rest:
            tokens.extend(rest.split())
        while len(tokens) < 3:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated header")
            line = line.split("#")[0].strip()
            if line:
                tokens.extend(line.split())
        n_verts, n_faces = int(tokens[0]), int(tokens[1])
        data = np.loadtxt(f, max_rows=n_verts, dtype=np.float64)
        verts = np.ascontiguousarray(data[:, :3], np.float32)
        faces = None
        if n_faces > 0:
            fdata = np.loadtxt(f, max_rows=n_faces, dtype=np.int64)
            if fdata.ndim == 1:
                fdata = fdata[None]
            # rows are "k i0 i1 ... ik-1"; we only support triangles
            if not np.all(fdata[:, 0] == 3):
                raise ValueError(f"{path}: non-triangular faces")
            faces = np.ascontiguousarray(fdata[:, 1:4], np.int32)
    return verts, faces


def write_off_points(path: str, points: np.ndarray) -> None:
    """Write a point cloud as OFF (train.py:22-27 format)."""
    points = np.asarray(points)
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{points.shape[0]} 0 0\n")
        for p in points:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def write_off_mesh(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{verts.shape[0]} {faces.shape[0]} 0\n")
        for p in verts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def write_ply(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None = None,
) -> None:
    """ASCII PLY with per-vertex uchar RGB (reference Tools/utils.py:360-393
    `write_ply`, used for correspondence-colormap visual dumps)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces, np.int64)
    if colors is None:
        colors = np.zeros((verts.shape[0], 3), np.uint8)
    colors = np.broadcast_to(np.asarray(colors, np.uint8), (verts.shape[0], 3))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {verts.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {faces.shape[0]}\n")
        f.write("property list uchar int vertex_index\nend_header\n")
        for v, c in zip(verts, colors):
            f.write(f"{v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
