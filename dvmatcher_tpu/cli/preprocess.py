"""One-shot dataset preprocessing (the reference's implicit first-run work:
dataset.py:132-228 + misc/scirpts/dataset_preprocess_pv.py).

    python -m dvmatcher_tpu.cli.preprocess --config scape_r \
        [--features] [--dino-params dino_params.msgpack] [--views]

Computes per shape: FPS ordering, geodesic matrix, optionally the 1152-d
lifted visual features (feat_mat mode) and the 12 partial-view index files.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

from dvmatcher_tpu.data import preprocess_split, read_off
from dvmatcher_tpu.data.views import partial_view_indices, write_view_indices
from dvmatcher_tpu.utils import load_config


def make_feat_fn(dino_params_path: str | None):
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.models.dino import FeatureLifter

    lifter = FeatureLifter()
    params = None
    apply = jax.jit(lambda p, pc: lifter.apply(p, pc))

    def feat_fn(verts: np.ndarray) -> np.ndarray:
        nonlocal params
        pc = jnp.asarray(verts, jnp.float32)[None]
        if params is None:
            if dino_params_path:
                from flax import serialization

                with open(dino_params_path, "rb") as f:
                    restored = serialization.msgpack_restore(f.read())
                template = lifter.init(jax.random.PRNGKey(0), pc)
                params = {"params": _graft(template["params"], restored)}
            else:
                print(
                    "[preprocess] WARNING: no --dino-params given; lifting "
                    "with random-init ViT (pipeline-complete, not "
                    "feature-parity)"
                )
                params = lifter.init(jax.random.PRNGKey(0), pc)
        return np.asarray(apply(params, pc)[0])

    return feat_fn


def _graft(template: dict, converted: dict) -> dict:
    """Overlay converted tensors onto the init tree where keys+shapes match;
    report what stayed random."""
    import jax

    missing = []

    def walk(t, c, path=""):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = walk(v, c.get(k, {}) if isinstance(c, dict) else {}, path + k + "/")
            else:
                cv = c.get(k) if isinstance(c, dict) else None
                if cv is not None and tuple(np.shape(cv)) == tuple(v.shape):
                    out[k] = np.asarray(cv, np.float32)
                else:
                    out[k] = v
                    missing.append(path + k)
        return out

    grafted = walk(template, converted)
    if missing:
        print(f"[preprocess] {len(missing)} params kept random init:")
        for m in missing[:20]:
            print("   ", m)
    return grafted


def main():
    from dvmatcher_tpu.utils.config import enable_compilation_cache, select_platform

    select_platform()
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="scape_r")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--features", action="store_true", help="pre-extract lifted features")
    ap.add_argument("--dino-params", default=None)
    ap.add_argument(
        "--wks-features", action="store_true",
        help="pre-extract WKS spectral anchor features instead of DINO "
        "(frozen intrinsic per-point field; see spectral.wks.wks_descriptors)",
    )
    ap.add_argument("--wks-dim", type=int, default=128)
    ap.add_argument("--views", action="store_true", help="generate index_partial files")
    args = ap.parse_args()
    cfg = load_config(args.config)
    ds = cfg["dataset"]
    root = os.path.join(args.data_root, ds["root_train"])
    cache_dir = os.path.join(args.data_root, ds["cache_dir"])

    feat_fn = make_feat_fn(args.dino_params) if args.features else None
    if args.wks_features:
        from dvmatcher_tpu.spectral.wks import wks_descriptors

        def feat_fn(verts, faces=None, _d=args.wks_dim):  # noqa: F811
            return wks_descriptors(verts, faces, num_e=_d)
    for split in ("train", "test"):
        preprocess_split(
            root,
            split,
            cache_dir,
            n_points=ds["n_points"],
            slice_dist=not cfg["loss"]["partial"],
            feat_fn=feat_fn,
            knn_k=ds.get("knn_k", 12),
        )

    if args.views:
        out_dir = os.path.join(root, "index_partial")
        for split in ("train", "test"):
            d = Path(root) / f"shapes_{split}"
            for p in sorted(d.glob("*.off")):
                verts, faces = read_off(str(p))
                if faces is None:
                    print(f"[views] {p.stem}: no faces, skipping")
                    continue
                views = partial_view_indices(verts.astype(np.float64), faces)
                write_view_indices(out_dir, p.stem, views)
                print(f"[views] {p.stem}: {[len(v) for v in views]}")


if __name__ == "__main__":
    main()
