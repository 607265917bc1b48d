"""Correspondence inference driver (reference test.py parity).

Per ordered test pair: two backbone forwards + hard NN search both ways;
writes `result/<exp>/T/T_<n1>_<n2>.txt` (1-indexed, MATLAB protocol —
test.py:19-28) and `result/<exp>/feature/usefeature_<n>.mat` with key
`uphi` (test.py:123-133).

TPU design: test clouds are padded to one static bucket with masks, so a
single compiled program serves every pair (the reference re-runs dynamic
shapes per mesh). Features per shape are computed once and cached, then
pairs only pay the argmin search.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import scipy.io as sio

from dvmatcher_tpu.data import PairDataset, load_split
from dvmatcher_tpu.match import nn_correspondence
from dvmatcher_tpu.train import checkpoint as ckpt
from dvmatcher_tpu.train import create_train_state, forward_features
from dvmatcher_tpu.cli.train import ensure_cache
from dvmatcher_tpu.utils import load_config


def eval_net(cfg: dict, data_root: str, ckpt_root: str, result_root: str,
             max_pairs: int | None = None, shard_points: bool = False,
             bf16: bool = False):
    cache_dir = ensure_cache(cfg, data_root, "test")
    records = load_split(cache_dir, "test")
    # benchmark-specific pair lists (TOSCA per-class, SHREC'16 cuts/holes);
    # partial datasets default to template-to-all (test_partial.py parity)
    from dvmatcher_tpu.data.pairs import pairs_for, template_to_all

    combos = pairs_for(cfg["dataset"]["name"], "test", len(records))
    if combos is None and cfg["loss"]["partial"]:
        combos = template_to_all(len(records))
    ds = PairDataset(
        records,
        mode="test",
        bucket_multiple=cfg["tpu"]["bucket_multiple"],
        combinations=combos,
    )

    feat_dim = int(cfg.get("feat_dim", 1152)) if cfg["with_dino"] else None
    template, backbone, _, _ = create_train_state(
        jax.random.PRNGKey(0),
        n_points=cfg["dataset"]["n_points"],
        feat_dim=feat_dim,
        k_backbone=cfg["tpu"]["k_backbone"],
        use_kernel=jax.default_backend() == "tpu",  # fused inference kernels
        dtype=jnp.bfloat16 if bf16 else None,  # mixed-precision forward
    )
    exp_dir = str(Path(ckpt_root) / cfg["expname"])
    state = ckpt.restore(exp_dir, "ep_val_best", template)
    variables = {
        "params": state.params["backbone"],
        "batch_stats": state.batch_stats["backbone"],
    }
    fwd = forward_features(backbone)
    if shard_points and len(jax.devices()) > 1:
        # Point-axis (sequence-parallel) inference: BOTH stages shard the
        # point dimension over the device mesh. The backbone forward runs
        # under shard_map (attention keys/values all_gather'd, offset-
        # attention reductions psum_scatter'd — parallel/sharded_backbone);
        # the NN search combines per-slab argminima via all_gather
        # (parallel/sharded_search). For clouds whose N x N structures
        # exceed one chip.
        from dvmatcher_tpu.parallel import make_mesh
        from dvmatcher_tpu.parallel.sharded_backbone import sharded_forward
        from dvmatcher_tpu.parallel.sharded_search import (
            sharded_nn_search_padded,
        )

        mesh = make_mesh()
        n_dev = len(jax.devices())
        print(f"[mesh] point-axis sharded backbone + search over {n_dev} devices")

        if ds.bucket % n_dev == 0:
            sp_fwd = sharded_forward(
                backbone, mesh,
                with_feats=feat_dim is not None, with_mask=True,
            )

            def fwd(variables, xyz, feats, mask):  # noqa: F811
                if feat_dim is None:
                    return sp_fwd(variables, xyz, mask=mask)[0]
                return sp_fwd(variables, xyz, feats, mask)[0]

        else:
            print(
                f"[mesh] bucket {ds.bucket} not divisible by {n_dev} "
                "devices — backbone forward stays single-program"
            )

        def search(fa, fb, mask_b):
            n_b = int(mask_b.sum())
            return sharded_nn_search_padded(fa[0], fb[0], n_b, mesh)[None]

    else:
        search = jax.jit(nn_correspondence)

    # compute per-shape features once
    t_feat = time.time()
    feats, ns = {}, {}
    for i, r in enumerate(ds.records):
        item = ds._shape(i)
        xyz = jnp.asarray(item["xyz"])[None]
        mask = jnp.asarray(item["mask"])[None]
        lifted = (
            jnp.asarray(item["feat"])[None] if "feat" in item else None
        )
        desc = fwd(variables, xyz, lifted, mask)
        feats[i] = desc
        ns[i] = item["n"]
        print(f"[feat] {r.name}")
    for d in feats.values():  # force completion before timing the search
        float(d.sum())
    print(f"[feat] {len(feats)} shapes in {time.time() - t_feat:.2f}s")

    save_path = Path(result_root) / f"{cfg['expname']}_{cfg['dataset']['name']}"
    t_dir = save_path / "T"
    f_dir = save_path / "feature"
    t_dir.mkdir(parents=True, exist_ok=True)
    f_dir.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    pairs = ds.combinations[:max_pairs] if max_pairs else ds.combinations
    # Each loop iteration computes and writes BOTH directions, so ordered
    # permutation lists (which contain (i,j) and (j,i)) must be deduped to
    # unordered pairs or every T_*.txt is computed and written twice.
    seen: set[tuple[int, int]] = set()
    unordered = []
    for i, j in pairs:
        key = (min(i, j), max(i, j))
        if key not in seen:
            seen.add(key)
            unordered.append((i, j))
    n_dirs = 2 * len(unordered)
    for i, j in unordered:
        n1, n2 = ns[i], ns[j]
        name1, name2 = ds.records[i].name, ds.records[j].name
        mask_i = jnp.arange(feats[i].shape[1]) < n1
        mask_j = jnp.arange(feats[j].shape[1]) < n2
        t12 = np.asarray(search(feats[i], feats[j], mask_j[None]))[0][:n1]
        t21 = np.asarray(search(feats[j], feats[i], mask_i[None]))[0][:n2]
        np.savetxt(t_dir / f"T_{name1}_{name2}.txt", t12 + 1, fmt="%i")
        np.savetxt(t_dir / f"T_{name2}_{name1}.txt", t21 + 1, fmt="%i")
        for idx, name in ((i, name1), (j, name2)):
            p = f_dir / f"usefeature_{name}.mat"
            if not p.exists():
                sio.savemat(p, {"uphi": np.asarray(feats[idx][0][: ns[idx]])})
    dt = time.time() - t0
    print(
        f"[test] {n_dirs} directed pairs ({len(unordered)} unordered) in "
        f"{dt:.2f}s ({n_dirs / dt:.2f} pairs/s, search only)"
    )
    return save_path


def main():
    from dvmatcher_tpu.utils.config import enable_compilation_cache, select_platform

    select_platform()
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Run correspondence inference.")
    ap.add_argument("--config", default="scape_r")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--ckpt-dir", default="ckpt")
    ap.add_argument("--result-dir", default="result")
    ap.add_argument("--max-pairs", type=int, default=None)
    ap.add_argument(
        "--shard-points", action="store_true",
        help="point-axis sharding over all devices (multi-chip): backbone "
        "forward under shard_map + sharded NN search",
    )
    ap.add_argument(
        "--bf16", action="store_true",
        help="mixed-precision backbone forward (f32 params/descriptors)",
    )
    args = ap.parse_args()
    cfg = load_config(args.config)
    eval_net(cfg, args.data_root, args.ckpt_dir, args.result_dir,
             args.max_pairs, shard_points=args.shard_points, bf16=args.bf16)


if __name__ == "__main__":
    main()
