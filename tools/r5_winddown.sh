#!/bin/bash
# End-of-round wind-down: stop the regen chain cleanly (training resumes
# from its latest checkpoint next round), commit any partial evidence the
# chain hadn't committed yet, and produce the final bench + suite logs
# with the TPU free. Run with ~40 min of wall clock left.
cd /root/repo
echo "[winddown] start at $(date)"

# 1. stop the chain + its active child (no pattern kills: the chain pid
#    is recorded; its current child is found by parent pid).
if [ -f /tmp/regen.pid ]; then
  RP=$(cat /tmp/regen.pid)
  if kill -0 "$RP" 2>/dev/null; then
    CHILDREN=$(ps -o pid= --ppid "$RP")
    kill "$RP" 2>/dev/null
    for c in $CHILDREN; do
      # the child may be `timeout` wrapping python — kill its subtree root
      kill "$c" 2>/dev/null
      for gc in $(ps -o pid= --ppid "$c" 2>/dev/null); do
        kill "$gc" 2>/dev/null
      done
    done
    sleep 10
  fi
fi
echo "[winddown] chain stopped at $(date)"

commit_evidence() {
  msg="$1"; shift
  added=0
  for f in "$@"; do
    [ -e "$f" ] && git add -f "$f" && added=1
  done
  [ "$added" = 1 ] && git commit -q -m "$msg" \
    -m "No-Verification-Needed: evidence artifacts only, no source change" \
    && echo "[winddown] committed: $msg"
}

# 2. partial curves/logs the chain may not have committed
commit_evidence "WKS/wksdist/partial in-flight evidence at round cutoff" \
  ckpt/dvmatcher_scape_r_wks/metrics.jsonl \
  ckpt/probe_aligned_r3_wks.log \
  result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json \
  ckpt/dvmatcher_scape_r_wksdist/metrics.jsonl \
  ckpt/probe_aligned_r3_wksdist.log \
  result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json \
  ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl \
  ckpt/probe_partial_r3.log \
  ckpt/train_r3_wks.log ckpt/train_r3_wksdist.log

# 3. final bench (bf16 default) + fast suite evidence
timeout 1200 python -u bench.py > ckpt/bench_r3.log 2>&1
echo "[winddown] bench rc=$?: $(tail -1 ckpt/bench_r3.log)"
timeout 5400 env JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -q -m "not slow" > ckpt/pytest_r3.log 2>&1
echo "[winddown] pytest rc=$?: $(tail -1 ckpt/pytest_r3.log)"
commit_evidence "End-of-round evidence: headline bench + suite log" \
  ckpt/bench_r3.log ckpt/pytest_r3.log

echo "[winddown] DONE at $(date)"
