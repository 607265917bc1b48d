"""YAML config loading — schema mirrors the reference's config/*.yaml
(train.py:172-179) so its flat keys carry over, plus a `tpu:` section for
bucket sizes and mesh options. Unlike the reference, unknown keys raise and
required keys are defaulted explicitly in one place.
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml


def select_platform() -> None:
    """Honor `DVM_PLATFORM` (e.g. `cpu`) before any backend init.

    The axon TPU plugin outranks the plain `JAX_PLATFORMS` env var, so CLI
    runs that must stay off the TPU (e.g. while a training job owns the
    chip) set DVM_PLATFORM=cpu and this applies the config override that
    actually wins (same quirk documented in tests/conftest.py)."""
    p = os.environ.get("DVM_PLATFORM")
    if p:
        import jax

        jax.config.update("jax_platforms", p)


def enable_compilation_cache(path: str = "/tmp/dvm_jax_cache") -> None:
    """Persistent XLA compilation cache — first compiles of the big train/
    inference programs take minutes through the remote-compile tunnel;
    cached reruns skip them."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as e:  # older jax flags
        print(f"[cache] compilation cache unavailable: {e}")

_CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"

DEFAULTS: dict = {
    "expname": "default",
    "with_dino": False,
    # per-point anchor feature width when with_dino: 1152 = lifted
    # DINOv2/FeatUp (reference), 128 = WKS spectral anchor (scape_r_wks)
    "feat_dim": 1152,
    "feat_mat": False,
    "cache": False,
    "deform_mesh": False,
    "isPartial": False,
    "partialexpname": "",
    "dataset": {
        "name": "scape_r",
        "type": "vts",
        "subset": "remeshed",  # reference-yaml compatibility (ignored)
        "root_dataset": "data/",
        "root_train": "scape_r",
        "root_test": "scape_r",
        "root_geodist": "geodist/",  # reference key (ignored)
        "cache_dir": "cache/",
        "with_sym": False,
        "n_points": 4995,
        "knn_k": 12,
    },
    "optimizer": {"lr": 2e-3, "b1": 0.9, "b2": 0.99, "decay_iter": 10, "decay_factor": 0.5},
    "training": {"batch_size": 2, "epochs": 20, "seed": 0},
    "loss": {
        "k_deform": 10,
        "k_dist": 500,
        "N_dist": 1000,
        "partial": False,
        "min_alpha": 10,
        "max_alpha": 100,
        "w_dist": 0.02,
        "w_map": 0.005,
        "w_deform": 0.5,
        "w_self_rec": 0.5,
        "w_rank": 0.0,
        "w_img": 0.0,
        "deform": {"w_cd": 0.1, "w_arap": 0.01},
    },
    "misc": {"checkpoint_interval": 1, "log_interval": 5000},
    "tpu": {"bucket_multiple": 256, "k_backbone": 40},
}


def _merge(base: dict, override: dict, path: str = "") -> dict:
    out = dict(base)
    for k, v in override.items():
        if k not in base:
            # tolerate reference-only keys we intentionally ignore
            if k in ("val", "data", "misc"):
                continue
            raise KeyError(f"unknown config key {path + k!r}")
        if isinstance(v, dict) and isinstance(base[k], dict):
            out[k] = _merge(base[k], v, path + k + ".")
        else:
            out[k] = v
    return out


def load_config(name_or_path: str) -> dict:
    p = Path(name_or_path)
    # is_file (not exists): a data DIRECTORY named like a config (e.g.
    # scape_synth_partial/ in cwd) must not shadow the packaged yaml
    if not p.is_file():
        p = _CONFIG_DIR / f"{name_or_path}.yaml"
    with open(p) as f:
        raw = yaml.safe_load(f) or {}
    raw.pop("data", None)  # reference yaml anchor helper
    misc = raw.pop("misc", {})  # reference cuda/device keys are meaningless here
    raw.pop("val", None)
    cfg = _merge(DEFAULTS, raw)
    for k in ("checkpoint_interval", "log_interval"):
        if k in misc:
            cfg["misc"][k] = misc[k]
    return cfg
