"""Jitted train/eval steps (reference train.py:93-156 hot loop).

One fused XLA program per step: two backbone forwards, the full
GraphDeformLoss (including on-device deformation-graph construction), the
backward pass, and the Adam update — versus the reference's
GPU->CPU->GPU graph-build round-trip and per-step debug file dumps
(models/loss.py:1325-1337, 1284-1295).

Data parallelism: steps are ordinary jitted functions of sharded arrays —
shard the batch leading axis over the mesh (`parallel.shard_batch`),
replicate the state, and XLA all-reduces the gradients over ICI.

BatchNorm running stats: the two forwards chain (shape1's update feeds
shape2's tracking), matching torch's sequential-call EMA semantics;
normalisation in train mode uses each call's own batch stats, as in torch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import optax

from dvmatcher_tpu.losses import LossConfig, graph_deform_loss
from dvmatcher_tpu.train.state import TrainState


def _twin_forward(backbone, params, batch_stats, batch, train: bool):
    """Run the backbone on both shapes of the pair batch.

    Returns (feat1, feat2, new_batch_stats)."""
    def one(stats, side):
        xyz = side["xyz"]
        feats = side.get("feat")
        mask = side.get("mask")
        variables = {"params": params["backbone"], "batch_stats": stats}
        if train:
            (desc, _), upd = backbone.apply(
                variables, xyz, feats, True, mask, mutable=["batch_stats"]
            )
            return desc, upd["batch_stats"]
        desc, _ = backbone.apply(variables, xyz, feats, False, mask)
        return desc, stats

    feat1, stats1 = one(batch_stats["backbone"], batch["shape1"])
    feat2, stats2 = one(stats1, batch["shape2"])
    return feat1, feat2, {"backbone": stats2}


def make_train_step(
    backbone, deformer, tx, loss_cfg: LossConfig
) -> Callable[[TrainState, Any, jax.Array, jax.Array], tuple[TrainState, dict]]:
    """Build the jitted train step: (state, batch, alpha, key) -> (state, metrics)."""

    def loss_fn(params, batch_stats, batch, alpha, key):
        feat1, feat2, new_stats = _twin_forward(
            backbone, params, batch_stats, batch, train=True
        )

        def deformer_apply(f1c, f2c, v1, v12, pi, nodes):
            return deformer.apply({"params": params["deformer"]}, f1c, f2c, v1, v12, pi, nodes)

        anchors = None
        if "anchors1" in batch:
            anchors = (batch["anchors1"], batch["anchors2"])
        loss, aux = graph_deform_loss(
            deformer_apply,
            feat1,
            feat2,
            batch["shape1"].get("dist"),
            batch["shape2"].get("dist"),
            batch["shape1"]["xyz"],
            batch["shape2"]["xyz"],
            alpha,
            key,
            loss_cfg,
            anchors=anchors,
        )
        return loss, (aux, new_stats)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, alpha, key):
        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, alpha, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = {
            "loss": loss,
            "dist_loss": aux["dist_loss"],
            "deform_loss": aux["deform_loss"],
            "map_loss": aux["map_loss"],
            "self_rec_loss": aux["self_rec_loss"],
        }
        return new_state, metrics

    return train_step


def make_eval_step(backbone, deformer, loss_cfg: LossConfig):
    """Eval-mode loss (reference train.py:135-156): running BN stats, no grad."""

    @jax.jit
    def eval_step(state: TrainState, batch, alpha, key):
        feat1, feat2, _ = _twin_forward(
            backbone, state.params, state.batch_stats, batch, train=False
        )

        def deformer_apply(f1c, f2c, v1, v12, pi, nodes):
            return deformer.apply(
                {"params": state.params["deformer"]}, f1c, f2c, v1, v12, pi, nodes
            )

        anchors = None
        if "anchors1" in batch:
            anchors = (batch["anchors1"], batch["anchors2"])
        loss, aux = graph_deform_loss(
            deformer_apply,
            feat1,
            feat2,
            batch["shape1"].get("dist"),
            batch["shape2"].get("dist"),
            batch["shape1"]["xyz"],
            batch["shape2"]["xyz"],
            alpha,
            key,
            loss_cfg,
            anchors=anchors,
        )
        return {"loss": loss}

    return eval_step


def forward_features(backbone):
    """Inference forward: (variables, xyz, feats, mask) -> descriptors.

    The benchmark path (reference test.py:103-110)."""

    @jax.jit
    def fwd(variables, xyz, feats, mask=None):
        desc, _ = backbone.apply(variables, xyz, feats, False, mask)
        return desc

    return fwd
