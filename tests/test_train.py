"""Train-step smoke tests: loss decreases on a tiny overfit task, state
updates, eval step runs, and the whole thing works sharded over the
8-device CPU mesh (data parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.losses import LossConfig
from dvmatcher_tpu.parallel import make_mesh, replicate, shard_batch
from dvmatcher_tpu.train import create_train_state, make_eval_step, make_train_step
import pytest


def _tiny_batch(rng, b=2, n=32):
    verts1 = rng.normal(size=(b, n, 3)).astype(np.float32)
    verts2 = verts1 + 0.05 * rng.normal(size=(b, n, 3)).astype(np.float32)

    def mkdist(v):
        return np.linalg.norm(v[:, :, None] - v[:, None], axis=-1).astype(np.float32)

    return {
        "shape1": {"xyz": jnp.asarray(verts1), "dist": jnp.asarray(mkdist(verts1))},
        "shape2": {"xyz": jnp.asarray(verts2), "dist": jnp.asarray(mkdist(verts2))},
    }


def _setup(b=2, n=32):
    cfg = LossConfig(k_deform=4, k_dist=6, n_dist=8, w_map=0.005)
    state, backbone, deformer, tx = create_train_state(
        jax.random.PRNGKey(0),
        n_points=n,
        feat_dim=None,
        k_backbone=8,
        k_deform=cfg.k_deform,
        lr=1e-3,
    )
    return cfg, state, backbone, deformer, tx


@pytest.mark.slow
def test_train_step_updates_and_loss_drops(rng):
    cfg, state, backbone, deformer, tx = _setup()
    step = make_train_step(backbone, deformer, tx, cfg)
    batch = _tiny_batch(rng)
    losses = []
    key = jax.random.PRNGKey(42)  # fixed key -> deterministic objective
    for i in range(60):
        state, metrics = step(state, batch, jnp.asarray(50.0), key)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 60
    assert np.all(np.isfinite(losses))
    # Adam + train-mode BN make the first steps noisy; require the tail to
    # sit below the post-warmup plateau.
    assert np.mean(losses[-10:]) < np.mean(losses[2:12]), losses


def test_eval_step_runs(rng):
    cfg, state, backbone, deformer, tx = _setup()
    ev = make_eval_step(backbone, deformer, cfg)
    out = ev(state, _tiny_batch(rng), jnp.asarray(50.0), jax.random.PRNGKey(0))
    assert np.isfinite(float(out["loss"]))


@pytest.mark.slow
def test_data_parallel_step_on_mesh(rng):
    """8-way DP on the virtual CPU mesh: state replicated, batch sharded."""
    cfg, state, backbone, deformer, tx = _setup(b=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state = replicate(state, mesh)
    batch = shard_batch(_tiny_batch(rng, b=8), mesh)
    step = make_train_step(backbone, deformer, tx, cfg)
    state, metrics = step(state, batch, jnp.asarray(50.0), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_dp_matches_single_device(rng):
    """The sharded step computes the same loss as the unsharded one."""
    cfg, state, backbone, deformer, tx = _setup(b=8)
    batch = _tiny_batch(rng, b=8)
    step = make_train_step(backbone, deformer, tx, cfg)
    import copy

    s1, m1 = step(jax.tree_util.tree_map(jnp.copy, state), batch,
                  jnp.asarray(50.0), jax.random.PRNGKey(0))

    mesh = make_mesh()
    state_r = replicate(jax.tree_util.tree_map(jnp.copy, state), mesh)
    batch_r = shard_batch(batch, mesh)
    s2, m2 = step(state_r, batch_r, jnp.asarray(50.0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
