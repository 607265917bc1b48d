"""Robustness-variant generator tests."""

import numpy as np

from dvmatcher_tpu.data.off_io import read_off, write_off_mesh
from dvmatcher_tpu.data.robustness import (
    generate_noise_variants,
    generate_rotated_variants,
    noise_along_normals,
    random_rotation,
)


def _tet(tmp_path):
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    d = tmp_path / "shapes"
    d.mkdir()
    write_off_mesh(str(d / "t.off"), verts, faces)
    return verts, faces, d


def test_noise_magnitude(tmp_path):
    verts, faces, d = _tet(tmp_path)
    noisy = noise_along_normals(verts, faces, sigma=0.01)
    disp = np.linalg.norm(noisy - verts, axis=-1)
    assert 0 < disp.mean() < 0.1


def test_random_rotation_is_rotation():
    for seed in range(5):
        r = random_rotation(rng=np.random.default_rng(seed))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-10)
        # angle <= 30 degrees
        angle = np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1))
        assert angle <= np.pi / 6 + 1e-9


def test_generators_write_variants(tmp_path):
    verts, faces, d = _tet(tmp_path)
    generate_noise_variants(str(d), str(tmp_path / "noise"))
    for i in (1, 2, 3):
        v, f = read_off(str(tmp_path / "noise" / f"noi{i}" / "t.off"))
        assert v.shape == verts.shape
    generate_rotated_variants(str(d), str(tmp_path / "rot"))
    v, f = read_off(str(tmp_path / "rot" / "t.off"))
    np.testing.assert_allclose(
        np.linalg.norm(v, axis=-1), np.linalg.norm(verts, axis=-1), rtol=1e-5
    )


def test_augmentations_jittable():
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.data.augment import augment_batch, data_augmentation

    verts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 30, 3)), jnp.float32)
    out = jax.jit(lambda v, k: data_augmentation(v, k))(verts, jax.random.PRNGKey(0))
    assert out.shape == verts.shape
    # scale bounds keep norms in a sane band
    ratio = np.linalg.norm(np.asarray(out)) / np.linalg.norm(np.asarray(verts))
    assert 0.7 < ratio < 1.4
    batch = {"shape1": {"xyz": verts}, "shape2": {"xyz": verts}}
    out_b = augment_batch(batch, jax.random.PRNGKey(1))
    assert out_b["shape1"]["xyz"].shape == verts.shape
    # two shapes get independent augmentations
    assert not np.allclose(
        np.asarray(out_b["shape1"]["xyz"]), np.asarray(out_b["shape2"]["xyz"])
    )


def test_random_halfspace_crop_indices_valid():
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.data.augment import random_halfspace_crop

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((2, 300, 3)), jnp.float32)
    idx = random_halfspace_crop(v, jax.random.PRNGKey(7), n_keep=64)
    assert idx.shape == (2, 64)
    picked = np.take_along_axis(np.asarray(v), np.asarray(idx)[..., None], 1)
    # all picked points lie in ONE common half-space per batch
    ok = False
    for ax in range(3):
        for sg in (1.0, -1.0):
            if (picked[..., ax] * sg > 0).all():
                ok = True
    assert ok
