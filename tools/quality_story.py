"""Collate every aligned-GT probe log into one table (the round-3 quality
story): baselines, nodino collapse, alpha-clamp control, dist-only bisect,
WKS-anchored protocol. Prints markdown for BASELINE.md/README.md."""

from __future__ import annotations

import re
from pathlib import Path

CKPT = Path(__file__).resolve().parent.parent / "ckpt"

RUNS = [
    ("nodino ep1-10 (annealed alpha)", "probe_aligned_r3.log"),
    ("nodino ep11-20", "probe_aligned_r3_ep11_20.log"),
    ("alpha-clamp control", "probe_aligned_r3_alpha10.log"),
    ("dist-only bisect", "probe_aligned_r3_distonly.log"),
    ("dist-only ep12-20", "probe_aligned_r3_distonly20.log"),
    ("dist-only 20ep regen (r4)", "probe_aligned_r4_distonly.log"),
    ("WKS-anchored protocol", "probe_aligned_r3_wks.log"),
    ("WKS-anchored per-epoch (r4)", "probe_aligned_r4_wks.log"),
    ("combo: WKS anchor + dist-only", "probe_aligned_r4_wksdist.log"),
    ("dist-only rerun, fp-16 kernel (r5)", "probe_aligned_r5_distonly.log"),
    ("WKS+full+10x-dist stretch (r5)", "probe_aligned_r5_wksfull.log"),
    ("HARD s=.01 (rot+noise): dist-only", "probe_hard_distonly.log"),
    ("HARD s=.01 (rot+noise): WKS", "probe_hard_wks.log"),
    ("HARD s=.01 (rot+noise): wksdist", "probe_hard_wksdist.log"),
    ("HARD s=.02: dist-only", "probe_hard_s02_distonly.log"),
    ("HARD s=.02: WKS", "probe_hard_s02_wks.log"),
    ("HARD s=.02: wksdist", "probe_hard_s02_wksdist.log"),
    ("HARD s=.03: dist-only", "probe_hard_s03_distonly.log"),
    ("HARD s=.03: WKS", "probe_hard_s03_wks.log"),
    ("HARD s=.03: wksdist", "probe_hard_s03_wksdist.log"),
]

# partial->full probe (tools/probe_partial.py) uses its own line format
PARTIAL_LOG = "probe_partial_r5.log"


def parse(path: Path) -> dict:
    out = {}
    if not path.exists():
        return out
    for line in path.read_text().splitlines():
        m = re.match(r"(ep\S+): aligned mean geodesic error ([\d.]+)", line)
        if m:
            out[m.group(1)] = float(m.group(2))
        m = re.match(r"(xyz-NN|random|wks-NN) baseline:\s+([\d.]+)", line)
        if m:
            out.setdefault("_baselines", {})[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    base = None
    rows = []
    for label, fname in RUNS:
        d = parse(CKPT / fname)
        if not d:
            continue
        if "_baselines" in d and base is None:
            base = d["_baselines"]
        eps = {k: v for k, v in d.items() if k != "_baselines"}
        if eps:
            rows.append((label, eps))
    if base:
        print(
            "baselines: "
            + ", ".join(f"{k} {v:.3f}" for k, v in sorted(base.items()))
        )
    for label, eps in rows:
        cells = " ".join(f"{k}={v:.3f}" for k, v in eps.items())
        print(f"{label}: {cells}")

    ppath = CKPT / PARTIAL_LOG
    if ppath.exists():
        cells = []
        for line in ppath.read_text().splitlines():
            m = re.match(
                r"(ep\S+): partial->full aligned mean geodesic error ([\d.]+)",
                line,
            )
            if m:
                cells.append(f"{m.group(1)}={float(m.group(2)):.3f}")
            m = re.match(r"(xyz-NN|random) baseline:\s+([\d.]+)", line)
            if m:
                cells.append(f"{m.group(1)}={float(m.group(2)):.3f}")
        if cells:
            print("partial->full protocol: " + " ".join(cells))


if __name__ == "__main__":
    main()
