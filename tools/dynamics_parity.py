"""Training-DYNAMICS parity: the reference's own torch code vs this repo,
same host, same data, same schedule, same probe.

Why this exists (round 3): the unanchored ("nodino") protocol collapses —
aligned-GT error degrades to random-feature level while val_loss improves
(BASELINE.md "quality regression root cause"). Two hypotheses remain:
  (a) faithful reproduction — the reference objective itself does this when
      run without a frozen visual anchor;
  (b) an implementation divergence in this repo's loss/model/training.
No GPU exists here and the reference cannot run its real protocol on CPU
(25 s/forward at N=4995), so this harness shrinks the setting to N=1024 /
8 shapes / 20 epochs and runs BOTH implementations:

  --side ref   the reference's actual classes (models/model.py Uni3FC,
               models/loss.py GraphDeformLoss_Neural, lib/deformation_
               graph_point.py DeformationGraph_geod) on torch CPU, with
               import stubs for its CUDA/hub-only deps (knn_cuda, timm,
               pytorch3d, ChamferDistancePytorch, featup, ...). The stubs
               are *functionally exact* where exercised: the chamfer stub
               returns squared bidirectional NN distances like the CUDA
               extension it replaces.
  --side jax   this repo's backbone/loss/train step on the identical data.

IMPORTANT parity note (discovered reading model.py:682-711): the reference
has NO feature-free path — when `dino_feat is None` its Uni3FC renders the
cloud to depth images and runs the FeatUp/DINOv2 hub upsampler ON THE FLY,
so every reference configuration is anchored on frozen visual features.
The pos-only variant exists in the reference only as the commented-out
line `#clip_feats_new = pos` (model.py:715). This harness patches the
reference forward to that variant (a ~20-line replica of model.py:716-760
starting from conv0) — the architecture this repo's `nodino` configs run —
because the hub upsampler cannot be downloaded here and the question under
test is precisely the unanchored dynamics.

Both sides log per-epoch loss terms and the aligned-GT probe (the
data/scape_synth benchmark restricted to each variant's FPS-1024 subset,
evals/geodesic_error.py protocol) to ckpt/dynpar_<side>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_POINTS = 1024
N_SHAPES = 8
EPOCHS = 20
BATCH = 2
LR = 2e-3
BETAS = (0.9, 0.99)
DECAY_EVERY = 10
DECAY = 0.5
MIN_ALPHA, MAX_ALPHA = 10.0, 100.0
PROBE_EPOCHS = {1, 2, 3, 5, 7, 10, 14, 20}


# --------------------------------------------------------------------------
# shared data
# --------------------------------------------------------------------------

def load_tiny():
    """First N_SHAPES scape_r train shapes at the FPS-1024 prefix (the FPS
    ordering is greedy, so any prefix is itself a valid FPS subset) with the
    exact geodesic submatrix."""
    cache = REPO / "data/cache/scape_r"
    names = sorted(json.load(open(cache / "manifest_train.json"))["names"])[:N_SHAPES]
    verts, dists = [], []
    for nm in names:
        v = np.load(cache / f"{nm}.verts.npy")
        fps = np.load(cache / f"{nm}.fps.npy")
        d = np.load(cache / f"{nm}.dist.npy", mmap_mode="r")
        verts.append(v[fps[:N_POINTS]].astype(np.float32))
        dists.append(np.asarray(d[:N_POINTS, :N_POINTS], np.float32))
    return names, np.stack(verts), np.stack(dists)


def epoch_pairs(epoch: int):
    """All ordered pairs, shuffled with a seed shared by both sides."""
    pairs = [(i, j) for i in range(N_SHAPES) for j in range(N_SHAPES) if i != j]
    rng = np.random.default_rng(1000 + epoch)
    rng.shuffle(pairs)
    n_full = (len(pairs) // BATCH) * BATCH
    return pairs[:n_full]


def alpha_for(epoch: int) -> float:
    # reference train.py:77: np.linspace(min_alpha, max_alpha+1, epochs)
    return float(np.linspace(MIN_ALPHA, MAX_ALPHA + 1, EPOCHS)[epoch - 1])


def lr_for(epoch: int) -> float:
    # reference train.py:79-84: lr *= decay_factor when epoch % decay_iter == 0
    return LR * (DECAY ** (epoch // DECAY_EVERY))


class SubsetProbe:
    """Aligned-GT probe on the scape_synth variants, restricted to each
    variant's FPS-1024 subset (same metric kind as evals/geodesic_error.py:
    NN match in feature space, geodesic error on the target vs .vts GT)."""

    def __init__(self):
        from dvmatcher_tpu.data import read_off
        from dvmatcher_tpu.data.dataset import fps_numpy
        from dvmatcher_tpu.evals import load_vts

        bench = REPO / "data/scape_synth"
        self.names = sorted(p.stem for p in (bench / "shapes_test").glob("*.off"))
        self.verts = {}
        self.sub = {}
        self.vts = {}
        for n in self.names:
            v, _ = read_off(str(bench / "shapes_test" / f"{n}.off"))
            self.verts[n] = v.astype(np.float32)
            self.sub[n] = fps_numpy(v, N_POINTS, 0)
            self.vts[n] = load_vts(str(bench / "corres" / f"{n}.vts"))
        self.geo = dict(np.load(bench / "geo_cache.npz"))

    def subset_xyz(self, n):
        return self.verts[n][self.sub[n]]

    def error(self, phi: dict) -> float:
        """phi[name]: (N_POINTS, C) features at self.sub[name]."""
        errs = []
        for s in self.names:
            for t in self.names:
                if s == t:
                    continue
                # landmarks whose source vertex is in s's subset
                inv = np.full(len(self.verts[s]), -1, np.int64)
                inv[self.sub[s]] = np.arange(N_POINTS)
                sel = inv[self.vts[s]] >= 0
                queries = phi[s][inv[self.vts[s][sel]]]
                ft = phi[t]
                d = (
                    (queries**2).sum(-1, keepdims=True)
                    - 2 * queries @ ft.T
                    + (ft**2).sum(-1)[None]
                )
                pred_full = self.sub[t][d.argmin(-1)]
                errs.append(self.geo[t][pred_full, self.vts[t][sel]].mean())
        return float(np.mean(errs))


# --------------------------------------------------------------------------
# reference (torch) side
# --------------------------------------------------------------------------

def install_ref_stubs():
    import types

    import torch

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class KNNStub:
        def __init__(self, k=1, transpose_mode=True):
            self.k = k

        def __call__(self, ref, query):
            d = torch.cdist(query.float(), ref.float())
            dist, idx = d.topk(self.k, dim=-1, largest=False)
            return dist, idx

    class DropPathStub(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    class Chamfer3DStub(torch.nn.Module):
        """Functionally exact CPU replacement for the CUDA chamfer_3DDist:
        squared NN distances + indices in both directions."""

        def forward(self, a, b):
            d = torch.cdist(a.float(), b.float()) ** 2
            d1, i1 = d.min(-1)
            d2, i2 = d.min(-2)
            return d1, d2, i1.int(), i2.int()

    class SSIMStub(torch.nn.Module):
        def forward(self, a, b):
            return torch.zeros(())

    def _noop(*a, **k):
        raise RuntimeError("stubbed dependency called — path not expected")

    stub("knn_cuda", KNN=KNNStub)
    stub("timm")
    stub("timm.models")
    stub("timm.models.layers", DropPath=DropPathStub)
    stub("cv2")
    stub("open3d", geometry=types.SimpleNamespace(), utility=types.SimpleNamespace())
    stub("torchvision", transforms=stub("torchvision.transforms", Compose=_noop))
    stub("featup")
    stub("featup.util", pca=_noop, remove_axes=_noop, norm=_noop, unnorm=_noop)
    stub("potpourri3d", PointCloudHeatSolver=_noop)
    cd = stub("ChamferDistancePytorch")
    c3 = stub("ChamferDistancePytorch.chamfer3D")
    c3.dist_chamfer_3D = stub(
        "ChamferDistancePytorch.chamfer3D.dist_chamfer_3D",
        chamfer_3DDist=Chamfer3DStub,
    )
    cd.chamfer3D = c3
    stub("torchmetrics", StructuralSimilarityIndexMeasure=SSIMStub)
    stub("pytorch_lightning", LightningModule=object)
    stub("torch_geometric")
    stub("torch_scatter", scatter=_noop)
    stub("tensorboardX", SummaryWriter=_noop)
    ps = stub("psbody")
    ps.mesh = stub("psbody.mesh", Mesh=object)
    p3 = stub("pytorch3d")
    stub("pytorch3d.ops", ball_query=_noop, iterative_closest_point=_noop,
         corresponding_points_alignment=_noop)
    stub("pytorch3d.ops.knn", knn_gather=_noop, knn_points=_noop)
    stub("pytorch3d.structures")
    stub("pytorch3d.structures.pointclouds", Pointclouds=_noop)
    stub("misc.render_point_cloud", batch_render=_noop)
    return p3


# --- CPU patches (reference hard-codes .cuda() in these spots); module
# level so tools/cross_eval_ref.py can reuse them ---
def ref_pos_encoding_cpu(self, coor):
    # exact replica of model.py:544-560 minus the .cuda()
    import math

    import torch

    D = 64
    normal_coor = 2 * ((coor - coor.min()) / (coor.max() - coor.min())) - 1
    freqs = torch.arange(D, dtype=torch.float)
    freqs = math.pi * (2**freqs)
    freqs = freqs.view(*[1] * len(normal_coor.shape), -1)
    normal_coor = normal_coor.unsqueeze(-1)
    k = normal_coor * freqs
    x = torch.cat([torch.sin(k), torch.cos(k)], -1)
    return x.transpose(-1, -2).reshape(coor.shape[0], -1, coor.shape[-1])


def ref_forward_pos_only(self, x, dino_feat, upsampler):
    # the reference's commented-out pos-only variant (model.py:715
    # `#clip_feats_new = pos`), continuing exactly as model.py:716-760
    import torch

    batch_size = x.size(0)
    num_points = x.size(2)
    pos = self.pos_encoding_sin_wave(x)
    tmp = self.conv0(pos)
    x1 = self.n2p_attention1(tmp)
    x1_g = self.sa1(tmp)
    x2 = self.n2p_attention2(x1)
    x2_g = self.sa2(x1_g)
    x3 = self.n2p_attention3(x2)
    x3_g = self.sa3(x2_g)
    x4 = self.n2p_attention4(x3)
    x4_g = self.sa4(x3_g)
    x = torch.cat((x1, x2, x3, x4), dim=1)
    x_g = torch.cat((x1_g, x2_g, x3_g, x4_g), dim=1)
    x = self.conv1(x)
    x_g = self.conv2(x_g)
    x = x.max(dim=-1, keepdim=True)[0].repeat(1, 1, num_points)
    x_g = x_g.max(dim=-1, keepdim=True)[0].repeat(1, 1, num_points)
    x = torch.cat((x, x1, x2, x3, x4), dim=1)
    x_g = torch.cat((x_g, x1_g, x2_g, x3_g, x4_g), dim=1)
    x = self.conv3(x)
    x_g = self.conv4(x_g)
    x = torch.cat((x, x_g), dim=1)
    x_1 = self.conv5(x)
    x_2 = self.n2p_attention5(x_1)
    x_3 = self.n2p_attention6(x_2)
    x_4 = self.n2p_attention7(x_3)
    x = torch.cat((x_1, x_2, x_3, x_4), dim=1)
    x = self.conv6(x)
    x = x.transpose(2, 1).contiguous().view(batch_size, num_points, self.out)
    return x, tmp.permute(0, 2, 1)


def ref_forward_with_feat(self, x, dino_feat, upsampler):
    # the reference forward's dino_feat-given branch (model.py:709-761):
    # anchor features -> conv projection, + pos encoding, then the tower.
    # Identical to ref_forward_pos_only except the clip_feats path.
    import torch

    batch_size = x.size(0)
    num_points = x.size(2)
    clip_feats = self.conv(dino_feat.permute(0, 2, 1))
    pos = self.pos_encoding_sin_wave(x)
    tmp = self.conv0(clip_feats + pos)
    x1 = self.n2p_attention1(tmp)
    x1_g = self.sa1(tmp)
    x2 = self.n2p_attention2(x1)
    x2_g = self.sa2(x1_g)
    x3 = self.n2p_attention3(x2)
    x3_g = self.sa3(x2_g)
    x4 = self.n2p_attention4(x3)
    x4_g = self.sa4(x3_g)
    x = torch.cat((x1, x2, x3, x4), dim=1)
    x_g = torch.cat((x1_g, x2_g, x3_g, x4_g), dim=1)
    x = self.conv1(x)
    x_g = self.conv2(x_g)
    x = x.max(dim=-1, keepdim=True)[0].repeat(1, 1, num_points)
    x_g = x_g.max(dim=-1, keepdim=True)[0].repeat(1, 1, num_points)
    x = torch.cat((x, x1, x2, x3, x4), dim=1)
    x_g = torch.cat((x_g, x1_g, x2_g, x3_g, x4_g), dim=1)
    x = self.conv3(x)
    x_g = self.conv4(x_g)
    x = torch.cat((x, x_g), dim=1)
    x_1 = self.conv5(x)
    x_2 = self.n2p_attention5(x_1)
    x_3 = self.n2p_attention6(x_2)
    x_4 = self.n2p_attention7(x_3)
    x = torch.cat((x_1, x_2, x_3, x_4), dim=1)
    x = self.conv6(x)
    x = x.transpose(2, 1).contiguous().view(batch_size, num_points, self.out)
    return x, tmp.permute(0, 2, 1)


def run_ref(out_path: Path):
    import torch

    torch.manual_seed(0)
    import random as pyrandom

    pyrandom.seed(0)

    install_ref_stubs()
    sys.path.insert(0, "/root/reference")

    from models.model import Deformer, Uni3FC  # noqa: E402
    import models.loss as ref_loss  # noqa: E402

    Uni3FC.pos_encoding_sin_wave = ref_pos_encoding_cpu
    Uni3FC.forward = ref_forward_pos_only

    def chamfer_cpu(self, pos1, pos2):
        # loss.py:1115-1124 minus the .cuda() round-trips
        d1, d2, _, _ = self.chamfer_dist_3d(pos1, pos2)
        return torch.mean(d1) + torch.mean(d2)

    ref_loss.GraphDeformLoss_Neural.chamfer_loss = chamfer_cpu

    names, verts_np, dists_np = load_tiny()
    probe = SubsetProbe()
    verts = torch.from_numpy(verts_np)
    dists = torch.from_numpy(dists_np)

    backbone = Uni3FC(k=40)
    deformer = Deformer(k=10)
    criterion = ref_loss.GraphDeformLoss_Neural(
        k_deform=10, w_dist=0.02, w_map=0.005, k_dist=500, N_dist=1000,
        partial=False, w_deform=0.5, w_img=0, w_rank=0, w_self_rec=0.5,
        w_cd=0.1, w_arap=0.01, save_name="dynpar",
    )
    opt = torch.optim.Adam(
        list(backbone.parameters()) + list(deformer.parameters()),
        lr=LR, betas=BETAS,
    )

    # the loss dumps visual .off files relative to cwd — keep them in ckpt/
    scratch = REPO / "ckpt" / "dynpar_ref_scratch"
    scratch.mkdir(parents=True, exist_ok=True)
    os.chdir(scratch)

    def probe_now():
        backbone.eval()
        phi = {}
        with torch.no_grad():
            for n in probe.names:
                xv = torch.from_numpy(probe.subset_xyz(n))[None]
                phi[n] = backbone(xv.permute(0, 2, 1), None, None)[0][0].numpy()
        backbone.train()
        return probe.error(phi)

    out = open(out_path, "a")
    for epoch in range(1, EPOCHS + 1):
        for g in opt.param_groups:
            g["lr"] = lr_for(epoch)
        alpha = alpha_for(epoch)
        sums = dict(loss=0.0, dist=0.0, deform=0.0, map=0.0, self_rec=0.0)
        t0 = time.time()
        pairs = epoch_pairs(epoch)
        nsteps = 0
        for s in range(0, len(pairs), BATCH):
            chunk = pairs[s : s + BATCH]
            i1 = [a for a, _ in chunk]
            i2 = [b for _, b in chunk]
            v1, v2 = verts[i1], verts[i2]
            d1, d2 = dists[i1], dists[i2]
            feat1, _ = backbone(v1.permute(0, 2, 1), None, None)
            feat2, _ = backbone(v2.permute(0, 2, 1), None, None)
            loss, dist_l, deform_l, map_l, selfrec_l = criterion(
                feat1, feat2, d1, d2, v1, v2, alpha, deformer
            )
            loss.backward()
            opt.step()
            opt.zero_grad()
            sums["loss"] += float(loss)
            sums["dist"] += float(dist_l)
            sums["deform"] += float(deform_l)
            sums["map"] += float(map_l)
            sums["self_rec"] += float(selfrec_l)
            nsteps += 1
        rec = {
            "side": "ref",
            "epoch": epoch,
            "alpha": alpha,
            "sec": time.time() - t0,
            **{k: v / nsteps for k, v in sums.items()},
        }
        if epoch in PROBE_EPOCHS:
            rec["aligned_err"] = probe_now()
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(rec, flush=True)


# --------------------------------------------------------------------------
# this repo (jax) side
# --------------------------------------------------------------------------

def run_jax(out_path: Path):
    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.losses import LossConfig
    from dvmatcher_tpu.train import (
        create_train_state,
        forward_features,
        make_train_step,
    )
    from dvmatcher_tpu.train.state import set_learning_rate

    names, verts_np, dists_np = load_tiny()
    probe = SubsetProbe()

    state, backbone, deformer, tx = create_train_state(
        jax.random.PRNGKey(0), n_points=N_POINTS, feat_dim=None,
        batch_size=BATCH, lr=LR, b1=BETAS[0], b2=BETAS[1], use_kernel=False,
    )
    cfg = LossConfig(
        k_deform=10, k_dist=500, n_dist=1000, w_dist=0.02, w_map=0.005,
        w_deform=0.5, w_self_rec=0.5, w_rank=0.0, w_cd=0.1, w_arap=0.01,
    )
    step_fn = make_train_step(backbone, deformer, tx, cfg)
    fwd = forward_features(backbone)

    verts = jnp.asarray(verts_np)
    dists = jnp.asarray(dists_np)
    key = jax.random.PRNGKey(42)

    def probe_now(state):
        variables = {
            "params": state.params["backbone"],
            "batch_stats": state.batch_stats["backbone"],
        }
        phi = {}
        for n in probe.names:
            xv = jnp.asarray(probe.subset_xyz(n))[None]
            phi[n] = np.asarray(fwd(variables, xv, None)[0])
        return probe.error(phi)

    out = open(out_path, "a")
    lr_prev = None
    for epoch in range(1, EPOCHS + 1):
        lr = lr_for(epoch)
        if lr != lr_prev:
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr)
            )
            lr_prev = lr
        alpha = alpha_for(epoch)
        sums = dict(loss=0.0, dist=0.0, deform=0.0, map=0.0, self_rec=0.0)
        t0 = time.time()
        pairs = epoch_pairs(epoch)
        nsteps = 0
        for s in range(0, len(pairs), BATCH):
            chunk = pairs[s : s + BATCH]
            i1 = jnp.asarray([a for a, _ in chunk])
            i2 = jnp.asarray([b for _, b in chunk])
            batch = {
                "shape1": {"xyz": verts[i1], "dist": dists[i1]},
                "shape2": {"xyz": verts[i2], "dist": dists[i2]},
            }
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, jnp.float32(alpha), sub)
            sums["loss"] += float(metrics["loss"])
            sums["dist"] += float(metrics["dist_loss"])
            sums["deform"] += float(metrics["deform_loss"])
            sums["map"] += float(metrics["map_loss"])
            sums["self_rec"] += float(metrics["self_rec_loss"])
            nsteps += 1
        rec = {
            "side": "jax",
            "epoch": epoch,
            "alpha": alpha,
            "sec": time.time() - t0,
            **{k: v / nsteps for k, v in sums.items()},
        }
        if epoch in PROBE_EPOCHS:
            rec["aligned_err"] = probe_now(state)
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(rec, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "jax"], required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = Path(args.out or REPO / "ckpt" / f"dynpar_{args.side}.jsonl")
    if args.side == "ref":
        run_ref(out)
    else:
        run_jax(out)


if __name__ == "__main__":
    main()
