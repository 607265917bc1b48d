"""Train state: joint backbone+deformer params, BN stats, Adam.

Reference: train.py:62-69 — one Adam over backbone+deformer parameters,
lr 2e-3, betas (0.9, 0.99), step decay x0.5 every `decay_iter` epochs
(train.py:78-82). Unlike the reference (which checkpoints model
state_dicts only, train.py:162-169), the full state — optimizer moments,
BN running stats, step — is checkpointable via orbax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dvmatcher_tpu.models import Deformer, Uni3FC


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any  # {"backbone": ..., "deformer": ...}
    batch_stats: Any  # {"backbone": ...}
    opt_state: Any


def make_optimizer(lr: float, b1: float = 0.9, b2: float = 0.99):
    """Adam with an injectable learning rate (epoch-level step decay)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=b1, b2=b2)


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr in-place (reference train.py:78-82)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def create_train_state(
    key: jax.Array,
    *,
    n_points: int,
    feat_dim: int | None,
    batch_size: int = 2,
    k_backbone: int = 40,
    k_deform: int = 10,
    lr: float = 2e-3,
    b1: float = 0.9,
    b2: float = 0.99,
    use_kernel: bool = False,
    dtype: jnp.dtype | None = None,
) -> tuple[TrainState, Uni3FC, Deformer, optax.GradientTransformation]:
    """Initialise backbone + deformer + Adam, shapes fixed up front.

    `use_kernel=True` runs the fused Pallas attention kernels in both the
    forward and (via XLA-recompute custom VJPs) the training path.
    `dtype=jnp.bfloat16` enables mixed-precision backbone compute (params
    and checkpoints stay f32 — interchangeable with the default mode)."""
    kb, kd = jax.random.split(key)
    backbone = Uni3FC(k=k_backbone, use_kernel=use_kernel, dtype=dtype)
    deformer = Deformer(k=k_deform)

    xyz = jnp.zeros((1, n_points, 3))
    feats = None if feat_dim is None else jnp.zeros((1, n_points, feat_dim))
    bvars = backbone.init(kb, xyz, feats, False)

    c = backbone.out
    dvars = deformer.init(
        kd,
        jnp.zeros((1, n_points, k_deform, c)),
        jnp.zeros((1, n_points, k_deform, c)),
        xyz,
        xyz,
        jnp.zeros((1, n_points, n_points)),
        jnp.zeros((1, n_points // 2), jnp.int32),
    )

    params = {"backbone": bvars["params"], "deformer": dvars["params"]}
    batch_stats = {"backbone": bvars["batch_stats"]}
    tx = make_optimizer(lr, b1, b2)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    return state, backbone, deformer, tx
