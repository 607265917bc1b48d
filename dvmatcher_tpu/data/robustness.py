"""Robustness-eval dataset variants: normal-direction noise and random
rotations.

Ports of misc/scirpts/dataset_preprocess_noise.py (Gaussian noise with mean
0.01, sigma in {0.01, 0.02, 0.03}, applied elementwise along the vertex
normals) and dataset_preprocess_rotate.py (uniform random axis, rotation
angle <= 30 degrees — `get_sampled_rotation_matrices_by_axisAngle` with
angle factor 1/6 of pi, misc/scirpts/tools.py:379).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from dvmatcher_tpu.data.off_io import read_off, write_off_mesh
from dvmatcher_tpu.data.views import compute_vertex_normals


def noise_along_normals(
    verts: np.ndarray,
    faces: np.ndarray,
    sigma: float,
    mu: float = 0.01,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """verts + gauss(mu, sigma)^(N,3) * normals (elementwise product —
    dataset_preprocess_noise.py:70-74)."""
    rng = rng or np.random.default_rng(0)
    normals = compute_vertex_normals(verts.astype(np.float64), faces)
    noise = rng.normal(mu, sigma, size=verts.shape)
    return (verts + noise * normals).astype(np.float32)


def random_rotation(max_angle_factor: float = 1 / 6, rng=None) -> np.ndarray:
    """Uniform random axis, angle = uniform(0, pi * factor) (tools.py:379)."""
    rng = rng or np.random.default_rng(0)
    axis = rng.normal(size=3)
    axis = axis / np.linalg.norm(axis)
    theta = rng.uniform(0, np.pi * max_angle_factor)
    kx, ky, kz = axis
    kmat = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    return np.eye(3) + np.sin(theta) * kmat + (1 - np.cos(theta)) * kmat @ kmat


def generate_noise_variants(
    shapes_dir: str, out_root: str, sigmas=(0.01, 0.02, 0.03), seed: int = 0
) -> None:
    rng = np.random.default_rng(seed)
    for p in sorted(Path(shapes_dir).glob("*.off")):
        verts, faces = read_off(str(p))
        for i, sigma in enumerate(sigmas):
            noisy = noise_along_normals(verts, faces, sigma, rng=rng)
            out = Path(out_root) / f"noi{i + 1}"
            out.mkdir(parents=True, exist_ok=True)
            write_off_mesh(str(out / p.name), noisy, faces)


def generate_rotated_variants(shapes_dir: str, out_root: str, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    out = Path(out_root)
    out.mkdir(parents=True, exist_ok=True)
    for p in sorted(Path(shapes_dir).glob("*.off")):
        verts, faces = read_off(str(p))
        rot = random_rotation(rng=rng).astype(np.float32)
        write_off_mesh(str(out / p.name), verts @ rot, faces)
