"""Training driver (reference train.py parity).

Usage: python -m dvmatcher_tpu.cli.train --config scape_r_nodino
       [--data-root DIR] [--epochs N] [--max-steps N] [--ckpt-dir DIR]

Epoch loop over all ordered shape pairs; alpha annealed
linspace(min_alpha, max_alpha+1, epochs) (train.py:75); lr halved every
`decay_iter` epochs (train.py:78-82); per-epoch eval + val_best
checkpointing (train.py:135-169). Metrics stream to
<ckpt_dir>/<expname>/metrics.jsonl instead of tensorboardX scalars
(train.py:128-133) — same fields.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.data import PairDataset, load_split, preprocess_split
from dvmatcher_tpu.data.prefetch import prefetch
from dvmatcher_tpu.losses import LossConfig
from dvmatcher_tpu.parallel import make_mesh, replicate, shard_batch
from dvmatcher_tpu.train import create_train_state, make_eval_step, make_train_step
from dvmatcher_tpu.train import checkpoint as ckpt
from dvmatcher_tpu.train.state import set_learning_rate
from dvmatcher_tpu.utils import load_config


def loss_config_from(cfg: dict) -> LossConfig:
    lc = cfg["loss"]
    return LossConfig(
        k_deform=lc["k_deform"],
        k_dist=lc["k_dist"],
        n_dist=lc["N_dist"],
        w_dist=lc["w_dist"],
        w_map=lc["w_map"],
        w_deform=lc["w_deform"],
        w_self_rec=lc["w_self_rec"],
        w_rank=lc["w_rank"],
        w_cd=lc["deform"]["w_cd"],
        w_arap=lc["deform"]["w_arap"],
        w_img=lc.get("w_img", 0.0),
        partial=lc["partial"],
    )


def _rss_gb() -> float:
    """Host resident-set size in GB (leak observability — a protocol run
    that creeps toward the OOM killer should say so in metrics.jsonl)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return round(int(line.split()[1]) / 1e6, 2)
    except OSError:
        pass
    return float("nan")


def device_batch(batch: dict) -> dict:
    """Strip names, convert arrays; keep top-level extras (anchor indices)."""
    out = {}
    for k, v in batch.items():
        if k.startswith("shape") and isinstance(v, dict):
            out[k] = {
                kk: jnp.asarray(vv)
                for kk, vv in v.items()
                if not isinstance(vv, list)
            }
        else:
            out[k] = jnp.asarray(v)
    return out


def ensure_cache(cfg: dict, data_root: str, split: str) -> str:
    ds = cfg["dataset"]
    cache_dir = os.path.join(data_root, ds["cache_dir"])
    manifest = Path(cache_dir) / f"manifest_{split}.json"
    if not manifest.exists():
        root = os.path.join(data_root, ds["root_train"])
        preprocess_split(
            root,
            split,
            cache_dir,
            n_points=ds["n_points"],
            # partial pipelines re-index the full-vertex geodesic matrix
            # through each view before their own FPS crop
            slice_dist=not cfg["loss"]["partial"],
            knn_k=ds.get("knn_k", 12),
        )
    return cache_dir


def build_datasets(cfg: dict, data_root: str):
    """Full (PairDataset) or partial (PartialPairDataset) train/test pairs."""
    cache_dir = ensure_cache(cfg, data_root, "train")
    ensure_cache(cfg, data_root, "test")
    train_records = load_split(cache_dir, "train")
    test_records = load_split(cache_dir, "test")
    from dvmatcher_tpu.data.pairs import pairs_for

    name = cfg["dataset"]["name"]
    if cfg["loss"]["partial"]:
        from dvmatcher_tpu.data.partial import PartialPairDataset

        partial_dir = os.path.join(
            data_root, cfg["dataset"]["root_train"], "index_partial"
        )
        seed = cfg["training"]["seed"]
        train_ds = PartialPairDataset(
            train_records, partial_dir, mode="train", seed=seed,
            combinations=pairs_for(name, "train", len(train_records)),
        )
        test_ds = PartialPairDataset(
            test_records, partial_dir, mode="train", seed=seed + 1,
            combinations=pairs_for(name, "test", len(test_records)),
        )
    else:
        train_ds = PairDataset(
            train_records, mode="train",
            combinations=pairs_for(
                name, "train", len(train_records),
                [r.name for r in train_records],
            ),
        )
        test_ds = PairDataset(
            test_records, mode="train",
            combinations=pairs_for(
                name, "test", len(test_records),
                [r.name for r in test_records],
            ),
        )
    return train_ds, test_ds


def train_net(
    cfg: dict,
    data_root: str,
    ckpt_root: str,
    max_steps: int | None = None,
    resume: str | None = None,
    profile_dir: str | None = None,
    use_kernel: bool = False,
    val_batches: int | None = None,
):
    seed = cfg["training"]["seed"]
    key = jax.random.PRNGKey(seed)
    loss_cfg = loss_config_from(cfg)

    train_ds, test_ds = build_datasets(cfg, data_root)

    if cfg["with_dino"]:
        # fail loudly rather than silently training the nodino ablation —
        # anchor features are the whole point of a with_dino/feat_mat config
        missing = [
            r.name
            for ds in (train_ds, test_ds)
            for r in ds.records
            if r.feat is None
        ]
        if missing:
            raise SystemExit(
                f"[train] with_dino config but {len(missing)} shapes have no "
                f".feat.npy in the cache (e.g. {missing[:3]}); run "
                "cli.preprocess --features / --wks-features first"
            )

    n_points = cfg["dataset"]["n_points"]
    feat_dim = int(cfg.get("feat_dim", 1152)) if cfg["with_dino"] else None
    lr = float(cfg["optimizer"]["lr"])
    state, backbone, deformer, tx = create_train_state(
        key,
        n_points=n_points,
        feat_dim=feat_dim,
        k_backbone=cfg["tpu"]["k_backbone"],
        k_deform=loss_cfg.k_deform,
        lr=lr,
        b1=cfg["optimizer"]["b1"],
        b2=cfg["optimizer"]["b2"],
        # Kernel choice is a flag: round-1 measured XLA's saved-activation
        # backward ahead of the f32 custom-VJP kernels at B=2 (0.77 vs
        # 1.29 s), but the fast compensated-bf16 kernel mode added later
        # changes that balance — probe with --use-kernel.
        use_kernel=use_kernel,
    )

    exp_dir = Path(ckpt_root) / cfg["expname"]
    exp_dir.mkdir(parents=True, exist_ok=True)

    start_epoch = 1
    if resume:
        # Full-state resume (params + Adam moments + BN stats + step) —
        # the reference can only reload model weights (train.py:162-169)
        state = ckpt.restore(str(exp_dir), resume, state)
        start_epoch = int(state.step) // max(len(train_ds) // cfg["training"]["batch_size"], 1) + 1
        print(f"[resume] restored '{resume}' at step {int(state.step)} -> epoch {start_epoch}")
        # Replay past lr-decay boundaries: the restored opt_state already
        # carries the decayed lr, but the python-side accumulator must
        # match or the next boundary decays from the undecayed base (the
        # epoch-20 step would run at 2x its protocol lr) and the metrics
        # log reports the config lr instead of the live one.
        for past_epoch in range(1, start_epoch):
            if past_epoch % cfg["optimizer"]["decay_iter"] == 0:
                lr *= cfg["optimizer"]["decay_factor"]
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

    epochs = cfg["training"]["epochs"]
    bs = cfg["training"]["batch_size"]
    # Resident geodesic matrices: upload every shape's bf16 dist matrix to
    # the device once and feed only anchor indices per step (the 40 MB/step
    # dist feed is the remote-tunnel bottleneck AND a client-RAM leak — see
    # data.dataset.device_dist_cache). Partial pipelines keep FULL-VERTEX
    # matrices resident and ship only the per-step view-FPS index frame
    # (~9 KB); an on-device gather builds each side's submatrix (the host
    # feed would ship ~100 MB per sample through the tunnel).
    use_dev_dist = True
    dist_cache = {}
    if use_dev_dist:
        from dvmatcher_tpu.data import device_dist_cache

        print("[feed] uploading resident geodesic matrices ...", flush=True)
        dist_cache = device_dist_cache(
            train_ds.records, slice_fps=not loss_cfg.partial
        )
        dist_cache.update(
            device_dist_cache(test_ds.records, slice_fps=not loss_cfg.partial)
        )
        print(f"[feed] {len(dist_cache)} matrices resident on device", flush=True)

    import functools

    @functools.partial(jax.jit)
    def _subm(dist_full, sel):
        """(n_sel, n_sel) geodesic submatrix gather, on device."""
        return dist_full[sel][:, sel]

    def attach_resident_dist(b: dict, raw: dict) -> None:
        for side in ("shape1", "shape2"):
            if raw[side]["name"][0] not in dist_cache:
                continue
            if "sel" in b[side]:
                sel = b[side].pop("sel")
                b[side]["dist"] = jnp.stack([
                    _subm(dist_cache[n], sel[i])
                    for i, n in enumerate(raw[side]["name"])
                ])
            else:
                b[side]["dist"] = jnp.stack(
                    [dist_cache[n] for n in raw[side]["name"]]
                )
    # DP over as many devices as evenly divide the pair batch
    n_dev = max(d for d in range(1, len(jax.devices()) + 1) if bs % d == 0)
    mesh = make_mesh(jax.devices()[:n_dev])
    if n_dev > 1:
        print(f"[mesh] data-parallel over {n_dev} devices")
    state = replicate(state, mesh)
    train_step = make_train_step(backbone, deformer, tx, loss_cfg)
    eval_step = make_eval_step(backbone, deformer, loss_cfg)

    # FULL residency + index feed (round 3). The per-step host->device
    # transfers (xyz ~240 KB, anchor features ~10 MB on with_dino configs)
    # leak their client-side host copy under the axon remote backend —
    # the wks protocol run grew ~17 GB/epoch and was OOM-killed at 125 GB
    # RSS (dmesg, global_oom). The TPU-native fix is also the faster
    # design: stack xyz/feat of every train+test shape on the device ONCE
    # next to the already-resident geodesic matrices, and feed the hot
    # loop nothing but row indices + anchor indices (~10 KB/step). The
    # batch is assembled on device inside the jitted step.
    fused_resident = (
        use_dev_dist
        and not loss_cfg.partial
        and n_dev == 1
        and not os.environ.get("DVM_NO_FUSED_FEED")
        and all(
            r.name in dist_cache
            for ds in (train_ds, test_ds)
            for r in ds.records
        )
    )
    if fused_resident:
        _recs = {}
        for r in [*train_ds.records, *test_ds.records]:
            _recs.setdefault(r.name, r)
        _names = sorted(_recs)
        _row = {n: i for i, n in enumerate(_names)}
        xyz_all = jnp.asarray(
            np.stack([np.asarray(_recs[n].train_xyz, np.float32) for n in _names])
        )
        feat_all = (
            jnp.asarray(
                np.stack(
                    [np.asarray(_recs[n].train_feat, np.float32) for n in _names]
                )
            )
            if cfg["with_dino"]
            else None
        )
        dist_all = jnp.stack([dist_cache[n] for n in _names])  # (R, N, N) bf16
        _ones_mask = np.ones((bs, n_points), bool)

        _stacks = {"xyz": xyz_all, "dist": dist_all}
        if feat_all is not None:
            _stacks["feat"] = feat_all

        # the stacks are jit ARGUMENTS (closed-over device arrays would be
        # baked into the HLO as multi-GB literal constants)
        def _assemble(stacks, i1, i2, a1, a2):
            def side(ii):
                s = {
                    "xyz": stacks["xyz"][ii],
                    "dist": stacks["dist"][ii],
                    "mask": jnp.asarray(_ones_mask),
                }
                if "feat" in stacks:
                    s["feat"] = stacks["feat"][ii]
                return s

            return {
                "shape1": side(i1),
                "shape2": side(i2),
                "anchors1": a1,
                "anchors2": a2,
            }

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused_train_step(state, stacks, i1, i2, a1, a2, alpha, key):
            return train_step(state, _assemble(stacks, i1, i2, a1, a2), alpha, key)

        @jax.jit
        def fused_eval_step(state, stacks, i1, i2, a1, a2, alpha, key):
            return eval_step(state, _assemble(stacks, i1, i2, a1, a2), alpha, key)

        def _rows_of(raw):
            return (
                jnp.asarray([_row[n] for n in raw["shape1"]["name"]], jnp.int32),
                jnp.asarray([_row[n] for n in raw["shape2"]["name"]], jnp.int32),
            )

        print(
            f"[feed] fused-resident mode: {len(_names)} shapes "
            f"(xyz+dist{'+feat' if feat_all is not None else ''}) on device, "
            "index-only step feed",
            flush=True,
        )
    metrics_path = exp_dir / "metrics.jsonl"
    if not resume and metrics_path.exists():
        # A fresh (non-resume) run must not append to a previous run's
        # curve — the on-disk file has to map 1:1 to this run's epochs.
        # Rotate to a unique name: a fixed metrics_prev.jsonl would be
        # clobbered by the next fresh run, losing the older curve.
        n = 0
        while (exp_dir / f"metrics_prev{n or ''}.jsonl").exists():
            n += 1
        metrics_path.rename(exp_dir / f"metrics_prev{n or ''}.jsonl")
    metrics_f = open(metrics_path, "a")
    best_val_hist = float("inf")
    if resume and (exp_dir / "metrics.jsonl").exists():
        # ep_val_best must survive a resume: seed the best-val tracker from
        # the run's own history or a post-resume epoch worse than the true
        # best silently overwrites the protocol's selected checkpoint.
        with open(exp_dir / "metrics.jsonl") as hist:
            for line in hist:
                try:
                    v = json.loads(line).get("val_loss")
                except json.JSONDecodeError:
                    continue
                if v is not None and v < best_val_hist:
                    best_val_hist = v
    alphas = np.linspace(cfg["loss"]["min_alpha"], cfg["loss"]["max_alpha"] + 1, epochs)
    best_val = best_val_hist
    step_count = 0
    rngkey = jax.random.PRNGKey(seed + 1)

    if profile_dir:
        # jax.profiler trace around the hot loop (the reference has no
        # tracing at all — SURVEY.md section 5)
        jax.profiler.start_trace(profile_dir)

    for epoch in range(start_epoch, epochs + 1):
        if epoch % cfg["optimizer"]["decay_iter"] == 0:
            lr *= cfg["optimizer"]["decay_factor"]
            print(f"decaying lr -> {lr}")
            state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))
        alpha = jnp.asarray(alphas[epoch - 1], jnp.float32)
        metric_acc, iters = None, 0
        t0 = time.time()
        slices = None if loss_cfg.partial else loss_cfg.n_dist
        # The producer thread does NUMPY assembly only; the device_put
        # happens here on the main thread. Concurrent device access from
        # two threads (feed transfers racing a main-thread compile) can
        # deadlock the axon remote client — observed twice, both times at
        # a feed boundary overlapping a fresh program compile.
        feed = prefetch(
            train_ds.batches(
                bs, shuffle=True, seed=seed + epoch, anchor_slices=slices,
                device_dist=use_dev_dist,
            )
        )
        for raw in feed:
            rngkey, sub = jax.random.split(rngkey)
            if fused_resident:
                i1, i2 = _rows_of(raw)
                state, m = fused_train_step(
                    state, _stacks, i1, i2,
                    jnp.asarray(raw["anchors1"]), jnp.asarray(raw["anchors2"]),
                    alpha, sub,
                )
            else:
                b = device_batch(raw)
                if use_dev_dist:
                    attach_resident_dist(b, raw)
                b = shard_batch(b, mesh)
                state, m = train_step(state, b, alpha, sub)
            # accumulate metrics ON DEVICE: one tiny fused add per step.
            # Reading per-step scalars at epoch end costs one tunnel RTT
            # per float() — ~7.6k blocking RPCs per epoch on the remote
            # axon device, which looks exactly like a hang.
            metric_acc = (
                m
                if metric_acc is None
                else jax.tree_util.tree_map(jnp.add, metric_acc, m)
            )
            iters += 1
            step_count += 1
            if iters % 8 == 0:
                # Throttle dispatch run-ahead: over the remote tunnel the
                # host loop can enqueue batches faster than the link
                # drains them, and every queued batch pins its host copy
                # (~40 MB/step -> unbounded RSS growth, observed >100 GB).
                # One sync per 8 steps bounds the backlog at ~8 batches.
                jax.block_until_ready(metric_acc)
            if iters % 50 == 0:
                print(
                    f"[step] epoch {epoch} iter {iters} "
                    f"({(time.time() - t0) / iters:.2f}s/it avg)",
                    flush=True,
                )
            if max_steps and step_count >= max_steps:
                break
        sums = (
            {k: float(v) for k, v in jax.device_get(metric_acc).items()}
            if metric_acc is not None
            else {}
        )
        row = {
            "epoch": epoch,
            "alpha": float(alpha),
            "lr": lr,
            "sec": time.time() - t0,
            "rss_gb": _rss_gb(),
            **{k: v / max(iters, 1) for k, v in sums.items()},
        }
        print(f"[train] {row}")

        # eval (train.py:135-156); same on-device accumulation
        val_acc, val_iters = None, 0
        val_feed = prefetch(
            test_ds.batches(
                bs, shuffle=False, anchor_slices=slices,
                device_dist=use_dev_dist,
            )
        )
        for raw in val_feed:
            rngkey, sub = jax.random.split(rngkey)
            if fused_resident:
                i1, i2 = _rows_of(raw)
                vl = fused_eval_step(
                    state, _stacks, i1, i2,
                    jnp.asarray(raw["anchors1"]), jnp.asarray(raw["anchors2"]),
                    alpha, sub,
                )["loss"]
            else:
                b = device_batch(raw)
                if use_dev_dist:
                    attach_resident_dist(b, raw)
                b = shard_batch(b, mesh)
                vl = eval_step(state, b, alpha, sub)["loss"]
            val_acc = vl if val_acc is None else val_acc + vl
            val_iters += 1
            # Protocol runs validate on the FULL test split (ep_val_best
            # selected on a <=2-batch estimate is selected on noise —
            # VERDICT r2 weak #7). The shortcut applies only to explicit
            # smoke runs (--max-steps) or an explicit --val-batches cap.
            val_cap = val_batches if val_batches else (2 if max_steps else None)
            if val_cap and val_iters >= val_cap:
                break
        val_loss = float(val_acc) if val_acc is not None else float("nan")
        row["val_loss"] = val_loss / max(val_iters, 1)
        print(f"[val]   epoch {epoch} loss {row['val_loss']:.4f}")
        metrics_f.write(json.dumps(row) + "\n")
        metrics_f.flush()

        if (epoch + 1) % cfg["misc"]["checkpoint_interval"] == 0:
            ckpt.save(str(exp_dir), f"ep_{epoch}", state)
        if row["val_loss"] <= best_val:
            best_val = row["val_loss"]
            ckpt.save(str(exp_dir), "ep_val_best", state)
        if max_steps and step_count >= max_steps:
            break
    if profile_dir:
        jax.profiler.stop_trace()
    metrics_f.close()
    return state


def main():
    from dvmatcher_tpu.utils.config import enable_compilation_cache, select_platform

    select_platform()
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Train the dvmatcher_tpu model.")
    ap.add_argument("--config", default="scape_r", help="config name or path")
    ap.add_argument("--data-root", default="data", help="directory holding <dataset>/shapes_*")
    ap.add_argument("--ckpt-dir", default="ckpt")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-steps", type=int, default=None, help="smoke-test cap")
    ap.add_argument("--resume", default=None, help="checkpoint tag to resume from (e.g. ep_5)")
    ap.add_argument("--profile-dir", default=None, help="write a jax.profiler trace here")
    ap.add_argument(
        "--val-batches", type=int, default=None,
        help="cap per-epoch validation at N batches (default: full test split; "
        "smoke runs with --max-steps default to 2)",
    )
    ap.add_argument(
        "--use-kernel", action="store_true",
        help="fused Pallas attention kernels (fast compensated-bf16 mode) "
        "in the train/eval steps instead of the XLA saved-activation path",
    )
    args = ap.parse_args()
    cfg = load_config(args.config)
    if args.epochs:
        cfg["training"]["epochs"] = args.epochs
    train_net(
        cfg, args.data_root, args.ckpt_dir,
        max_steps=args.max_steps, resume=args.resume,
        profile_dir=args.profile_dir, use_kernel=args.use_kernel,
        val_batches=args.val_batches,
    )


if __name__ == "__main__":
    main()
