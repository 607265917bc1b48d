"""Shape-pair datasets + one-shot preprocessing job.

Rebuild of reference models/dataset.py (Dataset/testDataset): scan
`<root>/shapes_{train,test}/*.off`, per shape compute the FPS ordering and
the geodesic supervision matrix, optionally pre-extract lifted visual
features, cache everything, and serve all ordered pairs.

Differences by design (TPU-first):
  * per-shape `.npy` caches, memory-mapped at load — the N x N geodesic
    matrices (~100 MB each) never transit Python pickles (reference
    torch.save's the whole list, dataset.py:218-228);
  * the geodesic matrix is stored already sliced to the FPS subset used in
    training (the reference slices per __getitem__, dataset.py:309);
  * test clouds are padded to a static bucket with masks instead of
    recompiling per mesh size.
"""

from __future__ import annotations

import dataclasses
import json
import os
from itertools import permutations
from pathlib import Path
from typing import Iterator

import numpy as np

from dvmatcher_tpu.data.geodesics import geodesics
from dvmatcher_tpu.data.off_io import read_off


def fps_numpy(xyz: np.ndarray, npoint: int, start: int = 0) -> np.ndarray:
    """Host FPS (reference models/model.py:48-63 semantics); C++ fast path."""
    from dvmatcher_tpu.data import native

    if native.available():
        out = native.fps(xyz, npoint, start)
        if out is not None:
            return out
    n = xyz.shape[0]
    out = np.zeros(npoint, np.int64)
    dist = np.full(n, 1e10, np.float64)
    far = start
    for i in range(npoint):
        out[i] = far
        d = ((xyz - xyz[far]) ** 2).sum(-1)
        np.minimum(dist, d, out=dist)
        far = int(dist.argmax())
    return out


@dataclasses.dataclass
class ShapeRecord:
    name: str
    verts: np.ndarray  # (N_full, 3) f32 — full cloud (test path)
    fps: np.ndarray  # (n_points,) i64 — FPS-selected subset (train path)
    dist: np.ndarray | None  # (n_points, n_points) f32, FPS-sliced, mmap
    feat: np.ndarray | None  # (N_full, 1152) f32 lifted features, mmap

    @property
    def train_xyz(self) -> np.ndarray:
        return self.verts[self.fps]

    @property
    def train_feat(self) -> np.ndarray | None:
        return None if self.feat is None else self.feat[self.fps]


def list_shapes(root: str, split: str) -> list[Path]:
    d = Path(root) / f"shapes_{split}"
    return sorted(p for p in d.iterdir() if p.suffix == ".off" and "DS_" not in p.stem)


def preprocess_split(
    root: str,
    split: str,
    cache_dir: str,
    *,
    n_points: int = 4995,
    with_dist: bool = True,
    slice_dist: bool = True,
    feat_fn=None,
    knn_k: int = 12,
    progress: bool = True,
) -> None:
    """One-shot preprocessing job -> per-shape .npy caches + manifest.

    `feat_fn(verts (N,3) f32[, faces]) -> (N, D) f32` optionally
    pre-extracts per-point anchor features (reference dataset.py:159-194
    `feat_mat` mode — lifted DINO features there; any frozen per-point
    field here, e.g. WKS via `--wks-features`).

    Idempotent per artifact: existing .npy files are kept, only missing
    ones are computed — so features can be backfilled into a cache whose
    geodesic matrices (the expensive part) already exist, e.g. via
    hard-links from a sibling cache dir.
    """
    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    names = []
    for p in list_shapes(root, split):
        name = p.stem
        names.append(name)
        feat_p = cache / f"{name}.feat.npy"
        need_feat = feat_fn is not None and not feat_p.exists()
        done_marker = cache / f"{name}.done"
        if done_marker.exists() and not need_feat:
            continue
        if progress:
            print(f"[preprocess] {split}/{name}", flush=True)
        verts, faces = read_off(str(p))
        fps_p = cache / f"{name}.fps.npy"
        if fps_p.exists():
            fps = np.load(fps_p)
        else:
            npts = min(n_points, verts.shape[0])
            fps = fps_numpy(verts, npts)
            np.save(cache / f"{name}.verts.npy", verts)
            np.save(fps_p, fps)
        if with_dist and not (cache / f"{name}.dist.npy").exists():
            d = geodesics(verts, faces, knn_k=knn_k)
            if slice_dist:
                d = d[np.ix_(fps, fps)]
            # partial pipelines need the full-vertex matrix (views re-index
            # it before their own FPS crop — dataset_partial.py:255)
            np.save(cache / f"{name}.dist.npy", d.astype(np.float32))
        if need_feat:
            try:
                feat = feat_fn(verts, faces)
            except TypeError:
                feat = feat_fn(verts)
            np.save(feat_p, np.asarray(feat, np.float32))
        done_marker.touch()
    manifest = {
        "names": names,
        "n_points": n_points,
        "with_dist": with_dist,
        "with_feat": feat_fn is not None,
    }
    with open(cache / f"manifest_{split}.json", "w") as f:
        json.dump(manifest, f)


def load_split(cache_dir: str, split: str, mmap: bool = True) -> list[ShapeRecord]:
    cache = Path(cache_dir)
    with open(cache / f"manifest_{split}.json") as f:
        manifest = json.load(f)
    mode = "r" if mmap else None
    records = []
    for name in manifest["names"]:
        verts = np.load(cache / f"{name}.verts.npy", mmap_mode=mode)
        fps = np.load(cache / f"{name}.fps.npy")
        dist_p = cache / f"{name}.dist.npy"
        feat_p = cache / f"{name}.feat.npy"
        dist = np.load(dist_p, mmap_mode=mode) if dist_p.exists() else None
        feat = np.load(feat_p, mmap_mode=mode) if feat_p.exists() else None
        records.append(ShapeRecord(name, verts, fps, dist, feat))
    return records


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class PairDataset:
    """All ordered pairs of shapes (reference dataset.py:143 permutations).

    mode="train": FPS-subset clouds (fixed n_points) + geodesic matrices.
    mode="test":  full clouds padded to a shared static bucket + masks.
    """

    def __init__(
        self,
        records: list[ShapeRecord],
        mode: str = "train",
        bucket_multiple: int = 256,
        combinations: list[tuple[int, int]] | None = None,
    ):
        self.records = records
        self.mode = mode
        self.combinations = combinations or list(
            permutations(range(len(records)), 2)
        )
        if mode == "test":
            self.bucket = _round_up(
                max(r.verts.shape[0] for r in records), bucket_multiple
            )
        else:
            self.bucket = records[0].fps.shape[0]

    def __len__(self) -> int:
        return len(self.combinations)

    def _shape(self, i: int, with_dist: bool = True) -> dict:
        r = self.records[i]
        if self.mode == "train":
            out = {
                "xyz": np.asarray(r.train_xyz, np.float32),
                "name": r.name,
            }
            if r.dist is not None and with_dist:
                d = r.dist
                if d.shape[0] == r.verts.shape[0]:  # full-vertex cache
                    d = d[np.ix_(np.asarray(r.fps), np.asarray(r.fps))]
                out["dist"] = np.asarray(d, np.float32)
            if r.feat is not None:
                out["feat"] = np.asarray(r.train_feat, np.float32)
            out["mask"] = np.ones(out["xyz"].shape[0], bool)
            return out
        n = r.verts.shape[0]
        pad = self.bucket - n
        out = {
            "xyz": np.pad(np.asarray(r.verts, np.float32), ((0, pad), (0, 0))),
            "mask": np.arange(self.bucket) < n,
            "n": n,
            "name": r.name,
        }
        if r.feat is not None:
            out["feat"] = np.pad(
                np.asarray(r.feat, np.float32), ((0, pad), (0, 0))
            )
        return out

    def get(self, idx: int, with_dist: bool = True) -> dict:
        i, j = self.combinations[idx]
        return {
            "shape1": self._shape(i, with_dist),
            "shape2": self._shape(j, with_dist),
        }

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        anchor_slices: int | None = None,
        device_dist: bool = False,
    ) -> Iterator[dict]:
        """Yield dicts of stacked numpy arrays (names kept as lists).

        `anchor_slices=n_dist` switches the geodesic supervision to the
        sliced-column feed: per batch, sample n_dist anchor indices (shared
        across the batch, reference loss.py:1361-1366), ship only
        dist[:, anchors] (~n_dist/N of the matrix) plus the anchor indices
        under keys 'anchors1'/'anchors2'. Cuts host->device traffic ~5x at
        the reference's N=4995/n_dist=1000."""
        rng = np.random.default_rng(seed + 1)
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        end = len(order) - (len(order) % batch_size if drop_last else 0)
        for s in range(0, end, batch_size):
            # device_dist: the geodesic matrices stay resident on the
            # device (see PairDataset.device_dist_cache) — skip the host
            # copy entirely and ship only the anchor indices.
            chunk = [
                self.get(int(k), with_dist=not device_dist)
                for k in order[s : s + batch_size]
            ]
            if len(chunk) < batch_size and drop_last:
                break
            batch = _stack(chunk)
            if device_dist and anchor_slices is not None:
                for key in ("anchors1", "anchors2"):
                    batch[key] = rng.choice(
                        self.bucket, size=anchor_slices, replace=False
                    ).astype(np.int32)
            elif anchor_slices is not None and "dist" in batch["shape1"]:
                import ml_dtypes

                for side, key in (("shape1", "anchors1"), ("shape2", "anchors2")):
                    n = batch[side]["dist"].shape[1]
                    anchors = rng.choice(n, size=anchor_slices, replace=False)
                    # bf16 halves host->device traffic; the dist term
                    # compares cosine profiles, insensitive at bf16
                    batch[side]["dist"] = np.ascontiguousarray(
                        batch[side]["dist"][:, :, anchors],
                        dtype=ml_dtypes.bfloat16,
                    )
                    batch[key] = anchors.astype(np.int32)
            yield batch


def _stack(items: list[dict]) -> dict:
    out = {}
    for side in ("shape1", "shape2"):
        first = items[0][side]
        stacked = {}
        for k, v in first.items():
            vals = [it[side][k] for it in items]
            if isinstance(v, str):
                stacked[k] = vals
            else:
                stacked[k] = np.stack(vals)
        out[side] = stacked
    return out


def device_dist_cache(records: list, slice_fps: bool = True) -> dict:
    """Upload each record's geodesic matrix to the default device ONCE as
    bf16 (~50 MB per SCAPE shape).

    Over a remote-tunnel TPU the per-step dist feed (~40 MB) outweighs the
    compute: the host loop enqueues faster than the link drains, pinning
    every queued batch in client RAM. Resident matrices + anchor-index
    feed cut per-step H2D to a few KB; the loss gathers anchor columns on
    device (graph_deform.dist_profile_loss full-matrix path).

    slice_fps=False keeps FULL-VERTEX matrices resident — the partial
    pipeline's mode, where each step re-indexes a random 12-view crop
    (reference dataset_partial.py:252-255): the step ships only the
    ~2200 view-FPS indices and an on-device gather builds the submatrix.
    """
    import jax
    import ml_dtypes

    cache = {}
    for r in records:
        if r.dist is None:
            continue
        d = r.dist
        if slice_fps and d.shape[0] == r.verts.shape[0]:  # full-vertex cache
            d = d[np.ix_(np.asarray(r.fps), np.asarray(r.fps))]
        cache[r.name] = jax.device_put(
            np.asarray(d, np.float32).astype(ml_dtypes.bfloat16)
        )
    return cache
