#!/usr/bin/env python3
"""Liveness watchdog for the round's TPU chain stages.

The axon remote-TPU client can lose an RPC and block forever (observed:
cli.train hung 40+ min mid-epoch with ~0 CPU while the chip was healthy
and a fresh client worked). The chain scripts wrap every stage in
`timeout`, but a 4 h timeout on a 15 min stage wastes the round's TPU
budget. This watchdog detects the hang signature — a process whose whole
job is to hammer the TPU/CPU consuming essentially zero CPU for 10
minutes — and kills that PID so the owning chain's retry loop resumes
from the last committed checkpoint.

Safety: targets are identified by EXACT argv match (python -u -m
dvmatcher_tpu.cli.<train|test|evaluate|deform>, the probe/bench tools,
bench.py) read from /proc/<pid>/cmdline — never by pattern-matching `ps`
output — and killed by specific PID. A healthy stage always clears the
CPU threshold: training steps feed data host-side every ~0.3-0.8 s, jit
compiles burn CPU, eval is numpy-bound; only a dead RPC wait sits at
zero.
"""

from __future__ import annotations

import os
import signal
import sys
import time

WATCH_MODULES = {
    "dvmatcher_tpu.cli.train",
    "dvmatcher_tpu.cli.test",
    "dvmatcher_tpu.cli.evaluate",
    "dvmatcher_tpu.cli.deform",
}
WATCH_SCRIPTS = {
    "tools/probe_aligned.py",
    "tools/probe_partial.py",
    "tools/bench_kernel.py",
    "tools/bench_kernel_ablate.py",
    "tools/bench_breakdown.py",
    "bench.py",
}
WINDOW_S = 600          # observation window (non-train stages)
# cli.train gets a much longer window: JAX dispatch is ASYNC, so the
# host queues a whole epoch in seconds and then sits at ~0 CPU while
# the TPU drains the queue to the epoch-end sync — the full-objective
# epoch-1 drain (compile + 1275 queued steps) measured 41 min on the
# r4 scape_r_wks run (ckpt/dvmatcher_scape_r_wks/metrics.jsonl: sec =
# 2466 for ep_1). A 600 s low-CPU window is indistinguishable from a
# healthy drain there; 2026-08-19 21:18 this watchdog's operator killed
# a healthy wksfull epoch-1 drain believing it a stuck RPC. Probes,
# tests and bench read back per-item scalars, so their quiet windows
# stay short and keep the tight 600 s window.
TRAIN_WINDOW_S = 3000
MIN_CPU_S = 3.0         # below this over the window => hung
POLL_S = 60
TICK = os.sysconf("SC_CLK_TCK")


def watched(pid: str) -> str | None:
    """Return a label if this PID is a chain stage we watch, else None."""
    try:
        argv = open(f"/proc/{pid}/cmdline", "rb").read().split(b"\0")
    except OSError:
        return None
    argv = [a.decode("utf-8", "replace") for a in argv if a]
    if not argv or not os.path.basename(argv[0]).startswith("python"):
        return None
    rest = [a for a in argv[1:] if a != "-u"]
    if len(rest) >= 2 and rest[0] == "-m" and rest[1] in WATCH_MODULES:
        return rest[1]
    if rest and rest[0] in WATCH_SCRIPTS:
        return rest[0]
    return None


def cpu_seconds(pid: str) -> float | None:
    try:
        parts = open(f"/proc/{pid}/stat").read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / TICK  # utime+stime
    except (OSError, IndexError, ValueError):
        return None


def main() -> None:
    # pid -> (label, first_seen_ts, window_start_ts, cpu_at_window_start)
    tracked: dict[str, tuple[str, float, float, float]] = {}
    while True:
        now = time.time()
        live = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            label = watched(pid)
            if label is None:
                continue
            cpu = cpu_seconds(pid)
            if cpu is None:
                continue
            win = TRAIN_WINDOW_S if label.endswith(".train") else WINDOW_S
            if pid in tracked and tracked[pid][0] == label:
                label_, seen, w_start, w_cpu = tracked[pid]
                if now - w_start >= win:
                    if cpu - w_cpu < MIN_CPU_S:
                        print(f"[watchdog] {time.ctime()} pid {pid} ({label}) "
                              f"used {cpu - w_cpu:.1f}s CPU in "
                              f"{now - w_start:.0f}s -> killing", flush=True)
                        try:
                            os.kill(int(pid), signal.SIGTERM)
                            time.sleep(15)
                            os.kill(int(pid), signal.SIGKILL)
                        except ProcessLookupError:
                            pass
                        continue  # drop from tracking
                    live[pid] = (label, seen, now, cpu)  # new window
                else:
                    live[pid] = (label_, seen, w_start, w_cpu)
            else:
                live[pid] = (label, now, now, cpu)
        tracked = live
        time.sleep(POLL_S)


if __name__ == "__main__":
    sys.stdout.write(f"[watchdog] start {time.ctime()}\n")
    sys.stdout.flush()
    main()
