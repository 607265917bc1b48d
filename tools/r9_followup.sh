#!/bin/bash
# Round-4 follow-up chain: waits for tools/r9_chain.sh (PID in /tmp/r9.pid)
# to release the TPU, then (a) piecewise bench breakdown, (b) registration
# artifacts from the WKS-anchored final checkpoint, (c) checkpoint-level
# cross-implementation evals of the FINAL checkpoints through the
# reference's own (stubbed-torch) pipeline on the host CPU, (d) the wksdist
# combo protocol as a hard-timeboxed stretch goal (watcher snapshots
# whatever epochs finish).
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
log() { echo "[r9b] $* at $(date)"; }
log "followup start"

MASTER_PID=$(cat /tmp/r9.pid 2>/dev/null)
while [ -n "$MASTER_PID" ] && kill -0 "$MASTER_PID" 2>/dev/null; do
  sleep 120
done
log "master chain done"

commit_paths() {
  local msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    for p in "$@"; do git add -f "$p" 2>/dev/null; done
    if ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r9b] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

# ---- CPU side in parallel: export final checkpoints + cross-eval ----
(
  for SPEC in "dvmatcher_scape_r_wks ep_val_best 128" \
              "dvmatcher_scape_r_wks ep_20 128" \
              "dvmatcher_scape_r_distonly ep_val_best 0"; do
    set -- $SPEC
    EXP=$1; TAG=$2; WKS=$3
    PT=/tmp/backbone_${EXP}_${TAG}.pt
    FD=""; WF=""
    if [ "$WKS" != 0 ]; then FD="--feat-dim $WKS"; WF="--wks $WKS"; fi
    nice -n 15 env JAX_PLATFORMS=cpu python -u tools/export_backbone.py \
      --exp "ckpt/$EXP" --tag "$TAG" $FD --out "$PT" \
      > "ckpt/export_${EXP}_${TAG}.log" 2>&1 || continue
    nice -n 15 env JAX_PLATFORMS=cpu python -u tools/cross_eval_ref.py \
      --weights "$PT" $WF \
      --compare "result/${EXP}_scape_synth/geodesic_error.json" \
      --out "ckpt/cross_eval_${EXP}_${TAG}.json" \
      > "ckpt/cross_eval_${EXP}_${TAG}.log" 2>&1
    echo "[r9b] cross-eval $EXP $TAG rc=$?"
    tail -3 "ckpt/cross_eval_${EXP}_${TAG}.log"
    commit_paths "Checkpoint-level cross-eval ($EXP $TAG) via reference pipeline" \
      "ckpt/cross_eval_${EXP}_${TAG}.json" "ckpt/cross_eval_${EXP}_${TAG}.log" \
      ckpt/cross_eval_wks_ep12.json ckpt/cross_eval_wks_ep12.log
  done
) &
CPU_PID=$!

# ---- TPU side ----
timeout 1800 env JAX_PLATFORMS=axon python -u tools/bench_breakdown.py \
  > ckpt/bench_breakdown_r4.log 2>&1
log "bench breakdown rc=$?"
grep -v WARNING ckpt/bench_breakdown_r4.log | tail -8
commit_paths "Piecewise bench breakdown (round 4)" ckpt/bench_breakdown_r4.log

REFPTH=/root/reference/ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth
for MODE in "" "--mesh"; do
  timeout 2400 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.deform \
    --config scape_r_wks $MODE --deformer-ref "$REFPTH" \
    >> ckpt/deform_r4_wks.log 2>&1
  log "deform wks $MODE rc=$?"
done
# also with this repo's OWN trained deformer from the WKS protocol
for MODE in "" "--mesh"; do
  timeout 2400 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.deform \
    --config scape_r_wks $MODE \
    >> ckpt/deform_r4_wks_own.log 2>&1
  log "deform wks own-deformer $MODE rc=$?"
done
commit_paths "Registration artifacts from the WKS final checkpoint (ref + own deformer)" \
  ckpt/deform_r4_wks.log ckpt/deform_r4_wks_own.log \
  result/deform_dvmatcher_scape_r_wks

# ---- stretch: wksdist combo protocol, hard-timeboxed ----
latest_ep() {
  ls -d "$1"/ep_[0-9]* 2>/dev/null | grep -E 'ep_[0-9]+$' \
    | sed 's/.*ep_//' | sort -n | tail -1
}
for attempt in 1 2; do
  EP=$(latest_ep ckpt/dvmatcher_scape_r_wksdist)
  if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
  RESUME=""
  if [ -n "$EP" ]; then RESUME="--resume ep_$EP"; fi
  log "wksdist attempt $attempt from ep_${EP:-0}"
  timeout 9000 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
    --config scape_r_wksdist --use-kernel $RESUME >> ckpt/train_r4_wksdist.log 2>&1
  log "wksdist attempt $attempt rc=$? latest=ep_$(latest_ep ckpt/dvmatcher_scape_r_wksdist)"
done
commit_paths "wksdist combo protocol (round 4 stretch): curve + log" \
  ckpt/train_r4_wksdist.log ckpt/dvmatcher_scape_r_wksdist/metrics.jsonl
EP=$(latest_ep ckpt/dvmatcher_scape_r_wksdist)
if [ -n "$EP" ] && [ "$EP" -ge 10 ]; then
  timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
    --exp ckpt/dvmatcher_scape_r_wksdist \
    ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best \
    > ckpt/probe_aligned_r4_wksdist.log 2>&1
  log "wksdist probe rc=$?"
  grep -v WARNING ckpt/probe_aligned_r4_wksdist.log | tail -10
  commit_paths "wksdist aligned probe" ckpt/probe_aligned_r4_wksdist.log
fi

wait $CPU_PID
log "ALL DONE"
