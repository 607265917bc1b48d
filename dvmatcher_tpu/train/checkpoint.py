"""Orbax checkpointing of the FULL train state.

The reference saves model state_dicts only — no optimizer moments, no
epoch counter (train.py:162-169), so resume restarts Adam cold. Here the
whole TrainState (params, BN stats, Adam state, step) round-trips. Tags
mirror the reference protocol: per-epoch, `train_best`, `val_best`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def save(ckpt_dir: str, tag: str, state: Any) -> None:
    path = Path(ckpt_dir).resolve() / tag
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def restore(ckpt_dir: str, tag: str, template: Any) -> Any:
    path = Path(ckpt_dir).resolve() / tag
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path, item=template)


def exists(ckpt_dir: str, tag: str) -> bool:
    return (Path(ckpt_dir).resolve() / tag).exists()
