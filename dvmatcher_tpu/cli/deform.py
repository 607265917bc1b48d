"""Registration driver (reference deform.py parity, point mode).

Warps a source shape onto a target via the trained backbone + Deformer and
writes `deform_<n1>_<n2>.off`. The reference hard-codes one SCAPE pair
(deform.py:159-162) — same defaults here, overridable by flags.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dvmatcher_tpu.data.off_io import read_off, write_off_points
from dvmatcher_tpu.deform.register import register_pair
from dvmatcher_tpu.train import checkpoint as ckpt
from dvmatcher_tpu.train import create_train_state
from dvmatcher_tpu.utils import load_config


def _load_deformer_params(state, ckpt_root, deformer_exp, deformer_ref, template):
    """Deformer params, possibly from a separate checkpoint.

    The reference loads the backbone (ep_val_best.pth) and the deformer
    (ep_deformer_val_best.pth) from separate files (deform.py:140-151);
    `--deformer-exp` takes the deformer from another experiment's
    ep_val_best, `--deformer-ref` converts a reference .pth (its only
    shipped trained artifacts) on the fly.
    """
    if deformer_ref:
        import torch

        from tools.convert_deformer import convert_deformer_state_dict

        sd = torch.load(deformer_ref, map_location="cpu", weights_only=True)
        return convert_deformer_state_dict(sd)
    if deformer_exp:
        other = ckpt.restore(str(Path(ckpt_root) / deformer_exp), "ep_val_best", template)
        return other.params["deformer"]
    return state.params["deformer"]


def eval_net(cfg, shape1_pth, shape2_pth, data_root, ckpt_root, result_root,
             deformer_exp=None, deformer_ref=None):
    verts1, faces1 = read_off(shape1_pth)
    verts2, faces2 = read_off(shape2_pth)
    name1 = Path(shape1_pth).stem
    name2 = Path(shape2_pth).stem

    feat_dim = int(cfg.get("feat_dim", 1152)) if cfg["with_dino"] else None
    template, backbone, deformer, _ = create_train_state(
        jax.random.PRNGKey(0),
        n_points=cfg["dataset"]["n_points"],
        feat_dim=feat_dim,
        k_backbone=cfg["tpu"]["k_backbone"],
        k_deform=cfg["loss"]["k_deform"],
        use_kernel=jax.default_backend() == "tpu",  # fused inference kernels
    )
    exp_dir = str(Path(ckpt_root) / cfg["expname"])
    state = ckpt.restore(exp_dir, "ep_val_best", template)
    bvars = {
        "params": state.params["backbone"],
        "batch_stats": state.batch_stats["backbone"],
    }
    dparams = _load_deformer_params(state, ckpt_root, deformer_exp, deformer_ref, template)

    v1 = jnp.asarray(verts1)[None]
    v2 = jnp.asarray(verts2)[None]
    if feat_dim is not None and feat_dim != 1152:
        # WKS-anchored checkpoint (configs/scape_r_wks.yaml): the frozen
        # intrinsic anchor is computable for arbitrary shapes on the fly —
        # mirror the training-side feat_mat plumbing (dataset.py:159-194).
        # Use the mesh cotan-LBO when faces exist (the training cache does:
        # preprocess_split passes feat_fn(verts, faces)) so the backbone sees
        # in-distribution anchor features; kNN fallback only for bare clouds.
        from dvmatcher_tpu.spectral.wks import wks_descriptors

        f1 = faces1 if faces1 is not None and len(faces1) else None
        f2 = faces2 if faces2 is not None and len(faces2) else None
        feats = (
            jnp.asarray(wks_descriptors(verts1, f1, num_e=feat_dim))[None],
            jnp.asarray(wks_descriptors(verts2, f2, num_e=feat_dim))[None],
        )
    elif feat_dim is not None:
        raise SystemExit(
            "[deform] with_dino config at feat_dim=1152 needs lifted DINO "
            "features; pretrained ViT weights are unavailable here — use a "
            "WKS-anchored or nodino config"
        )
    else:
        # positional-encoding-only backbone (nodino / distonly configs)
        feats = (None, None)

    graphs1 = None
    if cfg.get("deform_mesh"):
        # mesh mode (reference deform.py:167-216): qslim coarse graph +
        # true mesh geodesic influence weights, built host-side
        from dvmatcher_tpu.data.geodesics import mesh_geodesics
        from dvmatcher_tpu.deform.qslim import build_graph_mesh

        geod = mesh_geodesics(verts1.astype(np.float64), faces1)
        g = build_graph_mesh(verts1.astype(np.float64), faces1, geod)
        graphs1 = jax.tree_util.tree_map(lambda x: x[None], g)

    @jax.jit
    def run(v1, v2, graphs1):
        feat1, _ = backbone.apply(bvars, v1, feats[0], False)
        feat2, _ = backbone.apply(bvars, v2, feats[1], False)

        def deformer_apply(f1c, f2c, a, b, pi, nodes):
            return deformer.apply({"params": dparams}, f1c, f2c, a, b, pi, nodes)

        return register_pair(
            deformer_apply, feat1, feat2, v1, v2,
            alpha=100.0, k_deform=cfg["loss"]["k_deform"], graphs1=graphs1,
        )

    warped, verts12, arap = run(v1, v2, graphs1)
    out_dir = Path(result_root) / f"deform_{cfg['expname']}"
    out_dir.mkdir(parents=True, exist_ok=True)
    mode = "_mesh" if cfg.get("deform_mesh") else ""
    out = out_dir / f"deform_{name1}_{name2}{mode}.off"
    write_off_points(str(out), np.asarray(warped[0]))
    print(f"[deform] wrote {out} (arap={float(arap):.4f})")
    return out


def main():
    from dvmatcher_tpu.utils.config import enable_compilation_cache, select_platform

    select_platform()
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Deform a source shape onto a target.")
    ap.add_argument("--config", default="scape_r_nodino")
    ap.add_argument("--shape1", default="data/scape_r/shapes_train/mesh000.off")
    ap.add_argument("--shape2", default="data/scape_r/shapes_test/mesh053.off")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--ckpt-dir", default="ckpt")
    ap.add_argument("--result-dir", default="result")
    ap.add_argument("--mesh", action="store_true", help="qslim mesh-mode graph")
    ap.add_argument(
        "--deformer-exp", default=None,
        help="experiment whose ep_val_best supplies the deformer params "
        "(reference loads backbone/deformer from separate files)")
    ap.add_argument(
        "--deformer-ref", default=None,
        help="reference ep_deformer_val_best.pth to convert for the deformer")
    args = ap.parse_args()
    cfg = load_config(args.config)
    if args.mesh:
        cfg["deform_mesh"] = True
    eval_net(cfg, args.shape1, args.shape2, args.data_root, args.ckpt_dir,
             args.result_dir, deformer_exp=args.deformer_exp,
             deformer_ref=args.deformer_ref)


if __name__ == "__main__":
    main()
