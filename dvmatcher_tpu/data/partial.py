"""Partial-to-full pair dataset (reference models/dataset_partial.py).

Train pairs: shape1 = the full FPS-4995 cloud; shape2 = a random one of 12
partial views of the other shape (view index lists with > 2200 visible
vertices, dataset_partial.py:239-249), FPS-cropped to exactly 2200 points
(static shape for XLA), with the geodesic matrix re-indexed through the
view then the FPS crop (dataset_partial.py:252-255,279).

Test pairs: template-to-all combinations (0, i) (dataset_partial.py:384-386).
"""

from __future__ import annotations

from itertools import permutations
from pathlib import Path

import numpy as np

from dvmatcher_tpu.data.dataset import ShapeRecord, fps_numpy
from dvmatcher_tpu.data.views import read_view_indices

PARTIAL_POINTS = 2200
MIN_VIEW_SIZE = 2200


class PartialPairDataset:
    """Full (shape1) vs partial-view (shape2) ordered pairs."""

    def __init__(
        self,
        records: list[ShapeRecord],
        partial_dir: str,
        mode: str = "train",
        n_partial: int = PARTIAL_POINTS,
        seed: int = 0,
        combinations: list[tuple[int, int]] | None = None,
    ):
        self.records = records
        self.partial_dir = partial_dir
        self.mode = mode
        self.n_partial = n_partial
        self.rng = np.random.default_rng(seed)
        if combinations is not None:
            self.combinations = combinations
        elif mode == "train":
            self.combinations = list(permutations(range(len(records)), 2))
        else:
            # template-to-all (dataset_partial.py:384-386)
            self.combinations = [(0, i) for i in range(1, len(records))]
        # views with enough visible vertices, per shape
        self.valid_views: dict[int, list[int]] = {}
        for i, r in enumerate(records):
            views = []
            for v in range(1, 13):
                p = Path(partial_dir) / f"index_{r.name}_view_{v}.txt"
                if p.exists():
                    idx = np.loadtxt(p, dtype=np.int64).reshape(-1)
                    if idx.shape[0] > MIN_VIEW_SIZE:
                        views.append(v)
            self.valid_views[i] = views

    def __len__(self):
        return len(self.combinations)

    def _full(self, i: int) -> dict:
        r = self.records[i]
        out = {
            "xyz": np.asarray(r.train_xyz, np.float32),
            "name": r.name,
            "mask": np.ones(r.fps.shape[0], bool),
        }
        if r.dist is not None:
            d = r.dist
            if d.shape[0] == r.verts.shape[0]:  # full-vertex cache
                d = d[np.ix_(np.asarray(r.fps), np.asarray(r.fps))]
            out["dist"] = np.asarray(d, np.float32)
        if r.feat is not None:
            out["feat"] = np.asarray(r.train_feat, np.float32)
        return out

    def _partial(self, i: int, full_dist: bool = True) -> dict:
        r = self.records[i]
        views = self.valid_views[i]
        if not views:
            raise ValueError(f"no valid partial views for {r.name}")
        v = int(self.rng.choice(views))
        idx_partial = read_view_indices(self.partial_dir, r.name, v)
        verts = np.asarray(r.verts)[idx_partial]
        fps = fps_numpy(verts, self.n_partial)
        out = {
            "xyz": verts[fps].astype(np.float32),
            "name": r.name,
            "mask": np.ones(self.n_partial, bool),
            "view": v,
        }
        if not full_dist:
            # device-resident feed: the view-then-FPS index frame into the
            # shape's FULL vertex set (dataset_partial.py:252-255 semantics)
            out["sel"] = np.asarray(idx_partial[fps], np.int32)
            return out
        # dist on the full-resolution geodesics re-indexed through the view:
        # the cached record.dist is already FPS-sliced, so map partial
        # indices into the record's FPS frame where possible. For exact
        # reference semantics the cache stores full-vertex geodesics for
        # partial datasets (preprocess with n_points = full size).
        if r.dist is not None and full_dist:
            full_idx = np.asarray(r.fps)
            if r.dist.shape[0] == r.verts.shape[0]:
                sel = idx_partial[fps]
                out["dist"] = np.asarray(
                    r.dist[np.ix_(sel, sel)], np.float32
                )
            else:
                # The cache was FPS-sliced, so partial-view vertices cannot
                # be re-indexed into it. Substituting euclidean distances
                # here would silently degrade the geodesic supervision, so
                # refuse instead of drifting.
                raise ValueError(
                    f"geodesic cache for {r.name!r} is FPS-sliced "
                    f"({r.dist.shape[0]} rows != {r.verts.shape[0]} verts); "
                    "partial datasets need full-vertex geodesics — rerun "
                    "cli.preprocess with dataset.n_points set to the full "
                    "vertex count (or pass full_dist=False to train "
                    "without the dist term)."
                )
        return out

    def get(self, idx: int, with_dist: bool = True) -> dict:
        i, j = self.combinations[idx]
        out = {
            "shape1": self._full(i),
            "shape2": self._partial(j, full_dist=with_dist),
        }
        if not with_dist:
            # device-resident feed: ship only the index frames; the train
            # loop gathers each side's submatrix from the resident
            # full-vertex geodesic matrix on device
            out["shape1"].pop("dist", None)
            out["shape1"]["sel"] = np.asarray(self.records[i].fps, np.int32)
        return out

    def batches(
        self, batch_size: int, *, shuffle=False, seed=0, drop_last=True,
        anchor_slices=None,  # accepted for API symmetry; partial dist
        # matrices are 2200^2 (~19 MB) and ship whole on the host feed
        device_dist=False,
    ):
        from dvmatcher_tpu.data.dataset import _stack

        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        end = len(order) - (len(order) % batch_size if drop_last else 0)
        for s in range(0, end, batch_size):
            chunk = [
                self.get(int(k), with_dist=not device_dist)
                for k in order[s : s + batch_size]
            ]
            if len(chunk) < batch_size and drop_last:
                break
            for c in chunk:  # drop per-item extras that don't stack
                c["shape2"].pop("view", None)
            yield _stack(chunk)
