"""Generate the synthesized aligned-GT benchmark (data/scape_synth).

Usage: python tools/make_synth_gt.py [--template PATH] [--variants N]
           [--magnitude M] [--rotate] [--noise SIGMA] [--out DIR]

Writes shapes_test/synth*.off + corres/synth*.vts (see
dvmatcher_tpu/data/synthgt.py). Then:
    python -m dvmatcher_tpu.cli.test --config scape_synth
    python -m dvmatcher_tpu.cli.evaluate --config scape_synth \
        --feature-dir result/dvmatcher_scape_r_nodino_scape_synth/feature
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvmatcher_tpu.data.synthgt import generate_synth_benchmark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--template", default="data/scape_r/shapes_test/mesh052.off")
    ap.add_argument("--variants", type=int, default=6)
    ap.add_argument("--magnitude", type=float, default=0.25)
    ap.add_argument("--rotate", action="store_true")
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--out", default="data/scape_synth")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    names = generate_synth_benchmark(
        args.template, args.out, args.variants, seed=args.seed,
        magnitude=args.magnitude, rotate=args.rotate, noise_sigma=args.noise,
    )
    print(f"wrote {len(names)} variants to {args.out}: {names}")


if __name__ == "__main__":
    main()
