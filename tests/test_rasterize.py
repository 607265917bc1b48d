"""proj2img / I2P tests against a numpy/torch-free oracle of the reference
formulas (models/model.py:584-678), plus PiYG LUT parity with matplotlib."""

import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.ops.rasterize import i2p, piyg_colormap, proj2img, three_views


def _oracle_proj(pc, img_size=224):
    """numpy replication of models/model.py:584-650."""
    b, n, _ = pc.shape
    rng = pc.max(1) - pc.min(1)
    grid = rng[:, :2].max(-1) / (img_size - 3)
    pc_min = pc.min(1)[:, None, :2]
    idx_xy = np.floor((pc[:, :, :2] - pc_min) / grid[:, None, None])
    offs = np.array([[i, j] for i in range(-2, 3) for j in range(-2, 3)], np.float64)
    dense = (idx_xy[:, :, None, :] + offs[None, None]).reshape(b, n * 25, 2) + 1
    center = np.floor((dense.max(1) + dense.min(1)) / 2).astype(int)
    off_xy = img_size / 2 - center - 1
    dense = dense + off_xy[:, None, :]
    dense = dense + (dense < 0)
    dense = dense - (dense > img_size - 1)
    flat = (dense[:, :, 0] * img_size + dense[:, :, 1]).astype(int)
    z = np.repeat(pc[:, :, 2], 25, axis=1)
    acc = np.zeros((b, img_size * img_size))
    for bi in range(b):
        np.add.at(acc[bi], flat[bi], z[bi])
    return acc.reshape(b, img_size, img_size), pc_min, grid, off_xy


def test_scatter_accumulation_matches_oracle(rng):
    pc = rng.normal(size=(2, 200, 3)).astype(np.float32)
    img, pc_min, grid, offs = proj2img(jnp.asarray(pc))
    acc_or, pc_min_or, grid_or, off_or = _oracle_proj(pc.astype(np.float64))
    np.testing.assert_allclose(np.asarray(pc_min), pc_min_or, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grid)[:, 0, 0], grid_or, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(offs), off_or, rtol=1e-5)
    # empty-pixel sentinel where the oracle accumulated exactly 0
    img_np = np.asarray(img)
    np.testing.assert_array_equal(
        np.all(img_np == -1.0, axis=-1), acc_or == 0.0
    )
    assert img_np.shape == (2, 224, 224, 3)


def test_piyg_matches_matplotlib():
    import matplotlib

    cmap = matplotlib.colormaps["PiYG"]
    v = np.linspace(0, 1, 97)
    want = cmap(v)[:, :3]
    got = np.asarray(piyg_colormap(jnp.asarray(v, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_i2p_roundtrip_gathers_own_pixel(rng):
    """Points back-project to the pixel they rasterised into: seed a known
    per-pixel feature image and check the gather indices are in range and
    consistent between proj and i2p."""
    pc = rng.normal(size=(1, 100, 3)).astype(np.float32)
    img, pc_min, grid, offs = proj2img(jnp.asarray(pc))
    # feature image = flattened pixel index, so i2p returns each point's own
    # pixel id
    pix_id = np.arange(224 * 224, dtype=np.float32).reshape(1, 224, 224, 1)
    out = i2p(jnp.asarray(pc), jnp.asarray(pix_id), pc_min, grid, offs)
    out = np.asarray(out)[0, :, 0].astype(int)
    assert out.min() >= 0 and out.max() < 224 * 224
    # each point's pixel should be non-empty in the projection
    img_np = np.asarray(img).reshape(224 * 224, 3)
    assert not np.any(np.all(img_np[out] == -1.0, axis=-1))


def test_three_views_shapes(rng):
    pc = jnp.asarray(rng.normal(size=(2, 50, 3)).astype(np.float32))
    p1, p2, p3 = three_views(pc)
    assert p1.shape == p2.shape == p3.shape == (2, 50, 3)
    # views are channel permutations of the rotated cloud
    np.testing.assert_allclose(np.asarray(p2)[..., 1:], np.asarray(p1)[..., :2])
    np.testing.assert_allclose(np.asarray(p3)[..., :2], np.asarray(p1)[..., 1:])
