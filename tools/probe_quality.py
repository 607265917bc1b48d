"""Per-checkpoint descriptor-quality probe (no ground-truth .vts needed).

Usage: python tools/probe_quality.py [--rotate] [ep_1 ep_2 ...]

Perturbs SCAPE mesh052 with normal-direction noise (sigma 0.01, the
reference robustness protocol; add --rotate for the <=30-degree random
rotation variant), matches perturbed -> clean descriptors per checkpoint,
and prints the mean geodesic error under the identity ground truth.

Round-2 finding this reproduces: val_loss improves monotonically over the
20-epoch protocol (26.3 -> 24.1 by epoch 7) while THIS metric degrades
(ep_1: 0.19, ep_2: 0.52, ep_8: 0.62, random ~0.65) — the dist-profile +
deform objective at annealed alpha does not preserve noise-local
descriptors. Feed correctness was ruled out (host-sliced and
device-resident supervision verified bit-identical; loss branches agree
numerically). Open question for round 3: does the reference's descriptor
exhibit the same dynamic (its protocol eval uses aligned .vts pairs, not
noise robustness)?
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    exp = "ckpt/dvmatcher_scape_r_nodino"
    if "--exp" in argv:
        i = argv.index("--exp")
        exp = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    wks_dim = 0
    if "--wks" in argv:
        # probe a WKS-anchored checkpoint: recompute the anchor field on
        # the clean AND the perturbed geometry (the anchor is part of the
        # model input, so robustness includes the anchor's robustness)
        i = argv.index("--wks")
        wks_dim = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("-")]
    rotate = "--rotate" in argv
    tags = args or ["ep_1", "ep_2", "ep_8"]

    import jax
    import jax.numpy as jnp

    from dvmatcher_tpu.data import read_off
    from dvmatcher_tpu.data.geodesics import geodesics
    from dvmatcher_tpu.data.robustness import noise_along_normals, random_rotation
    from dvmatcher_tpu.evals import pair_geodesic_error
    from dvmatcher_tpu.train import checkpoint as ckpt
    from dvmatcher_tpu.train import create_train_state, forward_features

    verts, faces = read_off("data/scape_r/shapes_test/mesh052.off")
    geo = geodesics(verts, faces)
    noisy = noise_along_normals(verts, faces, 0.01)
    if rotate:
        noisy = noisy @ random_rotation(rng=np.random.default_rng(0)).astype(np.float32)

    fc = fn = None
    if wks_dim:
        from dvmatcher_tpu.spectral.wks import wks_descriptors

        fc = jnp.asarray(wks_descriptors(verts, faces, num_e=wks_dim))[None]
        fn = jnp.asarray(wks_descriptors(noisy, faces, num_e=wks_dim))[None]

    template, backbone, _, _ = create_train_state(
        jax.random.PRNGKey(0), n_points=4995,
        feat_dim=wks_dim or None, k_backbone=40,
        use_kernel=jax.default_backend() == "tpu",
    )
    fwd = forward_features(backbone)
    idx = np.arange(verts.shape[0])
    for tag in tags:
        state = ckpt.restore(exp, tag, template)
        v = {
            "params": state.params["backbone"],
            "batch_stats": state.batch_stats["backbone"],
        }
        pc = np.asarray(fwd(v, jnp.asarray(verts)[None], fc)[0])
        pn = np.asarray(fwd(v, jnp.asarray(noisy)[None], fn)[0])
        err = pair_geodesic_error(pn, pc, idx, idx, geo).mean()
        print(f"{tag}: mean geodesic error {err:.4f} (rotate={rotate})")


if __name__ == "__main__":
    main()
