"""Build the WKS-anchored cache for the synthesized aligned-GT benchmark.

The scape_synth_wks / scape_synth_wksdist test configs share
`data/cache/scape_synth_wks`, whose records must carry 128-d WKS anchor
features (the model input for WKS-anchored checkpoints). `cli.test`'s
`ensure_cache` builds FPS+geodesics only — this one-shot script adds the
feature field, mirroring `cli.preprocess --wks-features` for the
test-split-only synth dataset (which has no shapes_train directory, so
the full preprocess CLI cannot be used).

    python tools/make_synth_wks_cache.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvmatcher_tpu.data.dataset import preprocess_split  # noqa: E402
from dvmatcher_tpu.spectral.wks import wks_descriptors  # noqa: E402


def main() -> None:
    def feat_fn(verts, faces=None):
        return wks_descriptors(verts, faces, num_e=128)

    preprocess_split(
        "data/scape_synth",
        "test",
        "data/cache/scape_synth_wks",
        n_points=4995,
        slice_dist=True,
        feat_fn=feat_fn,
    )
    print("scape_synth_wks cache complete")


if __name__ == "__main__":
    main()
