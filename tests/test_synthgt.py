"""Synthesized aligned-GT benchmark tests (data/synthgt.py)."""

import numpy as np
import pytest

from dvmatcher_tpu.data.synthgt import (
    generate_synth_benchmark,
    make_variant,
    smooth_rbf_warp,
)


def _grid_mesh(n=12):
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], -1).astype(
        np.float32
    )
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return verts, np.asarray(faces, np.int64)


def test_smooth_warp_is_smooth_and_bounded():
    verts, faces = _grid_mesh()
    rng = np.random.default_rng(0)
    warped = smooth_rbf_warp(verts, rng, magnitude=0.2)
    diam = np.linalg.norm(verts.max(0) - verts.min(0))
    disp = np.linalg.norm(warped - verts, axis=1)
    assert disp.max() <= 0.2 * diam + 1e-5  # partition-of-unity bound
    assert disp.mean() > 0.01 * diam  # actually deforms
    # smoothness: neighboring vertices move almost together
    edge = np.linalg.norm(
        (warped[faces[:, 0]] - warped[faces[:, 1]])
        - (verts[faces[:, 0]] - verts[faces[:, 1]]),
        axis=1,
    )
    assert edge.max() < 0.05 * diam


def test_make_variant_vts_roundtrip():
    verts, faces = _grid_mesh()
    rng = np.random.default_rng(1)
    vv, ff, vts = make_variant(verts, faces, rng, magnitude=0.0)
    # magnitude 0 -> pure permutation: variant vertex vts[l] IS template l
    np.testing.assert_allclose(vv[vts], verts, atol=1e-6)
    # faces remap preserves the mesh: same edge lengths
    e0 = np.linalg.norm(verts[faces[:, 0]] - verts[faces[:, 1]], axis=1)
    e1 = np.linalg.norm(vv[ff[:, 0]] - vv[ff[:, 1]], axis=1)
    np.testing.assert_allclose(np.sort(e0), np.sort(e1), atol=1e-6)


def test_generate_benchmark_and_protocol(tmp_path):
    """End-to-end: generate variants, fake 'descriptors' = template
    coordinates through the GT map -> protocol error must be ~0; random
    descriptors must be >> 0."""
    from dvmatcher_tpu.data.geodesics import geodesics
    from dvmatcher_tpu.data.off_io import read_off
    from dvmatcher_tpu.evals import load_vts, pair_geodesic_error

    verts, faces = _grid_mesh()
    from dvmatcher_tpu.data.off_io import write_off_mesh

    tpl = tmp_path / "tpl.off"
    write_off_mesh(str(tpl), verts, faces)
    names = generate_synth_benchmark(str(tpl), str(tmp_path / "bench"), 3, seed=2)
    assert names == ["synth000", "synth001", "synth002"]

    shapes, vts = {}, {}
    for n in names:
        shapes[n] = read_off(str(tmp_path / "bench/shapes_test" / f"{n}.off"))
        v = load_vts(str(tmp_path / "bench/corres" / f"{n}.vts"))
        vts[n] = v
        # GT map invariant: variant vertex v[l] corresponds to template l
        assert v.shape == (len(verts),)

    # perfect descriptors: give each vertex its TEMPLATE coordinate
    # (identical for corresponding vertices across variants)
    phi = {}
    for n in names:
        inv = np.empty(len(verts), np.int64)
        inv[vts[n]] = np.arange(len(verts))  # variant idx -> template idx
        phi[n] = verts[inv]  # (V, 3): template coordinate of each variant vtx
    s, t = names[1], names[2]
    vt, ft = shapes[t]
    geo = geodesics(vt, ft)
    errs = pair_geodesic_error(phi[s], phi[t], vts[s], vts[t], geo)
    assert errs.mean() < 1e-6

    rng = np.random.default_rng(3)
    rand = pair_geodesic_error(
        rng.normal(size=phi[s].shape), rng.normal(size=phi[t].shape),
        vts[s], vts[t], geo,
    )
    assert rand.mean() > 0.1
