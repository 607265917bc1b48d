#!/bin/bash
# Round-5 chain 14: wksfull protocol COMPLETION supervisor.
#
# r11's training loop has 3 attempts; tonight's axon tunnel wedges
# clients mid-epoch (~0.6 s/min heartbeat CPU — evades the watchdog's
# low-CPU signature, see commit 487597b). This chain waits for r12
# (which runs r11 inline), then keeps resuming the wksfull run until
# ep_20, with its own stall guard: if metrics.jsonl gains no row AND
# the train log gains no bytes for 30 min, the trainer pid is killed
# (exact pid from its own pgid — never pattern-matched) and the next
# attempt resumes from the last committed epoch. Compile is cached, so
# healthy epochs are ~8 min; 30 min of zero progress is a wedge.
# Finally it re-runs the per-epoch probe + synth eval if r11 produced
# them against a shorter run (or not at all).
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
EXP=ckpt/dvmatcher_scape_r_wksfull
log() { echo "[r14] $* at $(date)"; }
log "chain start"

commit_paths() {
  local msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    for p in "$@"; do git add -f "$p" 2>/dev/null; done
    if ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r14] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

latest_ep() {
  ls -d "$EXP"/ep_[0-9]* 2>/dev/null | grep -E 'ep_[0-9]+$' \
    | sed 's/.*ep_//' | sort -n | tail -1
}

P=$(cat /tmp/r12.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 120; done
log "r12 (incl. inline r11) done; latest=ep_$(latest_ep)"

train_with_stall_guard() {  # one attempt, resumed; returns trainer rc
  local EP; EP=$(latest_ep)
  local RESUME=""
  [ -n "$EP" ] && RESUME="--resume ep_$EP"
  timeout 10800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
    --config scape_r_wksfull --use-kernel $RESUME \
    >> ckpt/train_r5_wksfull.log 2>&1 &
  local TPID=$!
  local last_sig="" same=0
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 300
    local sig
    sig="$(wc -c < ckpt/train_r5_wksfull.log 2>/dev/null):$(wc -l < "$EXP/metrics.jsonl" 2>/dev/null)"
    if [ "$sig" = "$last_sig" ]; then
      same=$((same + 1))
      if [ "$same" -ge 6 ]; then   # 30 min, zero progress -> wedge
        log "stall guard: no log/metrics progress 30 min, killing $TPID"
        kill "$TPID" 2>/dev/null; sleep 10
        kill -9 "$TPID" 2>/dev/null
        break
      fi
    else
      same=0; last_sig="$sig"
    fi
  done
  wait "$TPID" 2>/dev/null
  return $?
}

for attempt in 1 2 3 4 5 6; do
  EP=$(latest_ep)
  if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
  log "completion attempt $attempt from ep_${EP:-0}"
  train_with_stall_guard
  log "completion attempt $attempt rc=$? latest=ep_$(latest_ep)"
done
commit_paths "wksfull protocol: curve + log (completion supervisor)" \
  ckpt/train_r5_wksfull.log "$EXP/metrics.jsonl"
commit_paths "wksfull val-best weights" "$EXP/ep_val_best" "$EXP/ep_20"

EP=$(latest_ep)
# probe/eval at the FINAL state (r11 may have probed a shorter run)
if [ -n "$EP" ] && [ "$EP" -ge 5 ]; then
  for a in 1 2 3; do
    timeout 5400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
      --exp "$EXP" ep_1 ep_3 ep_5 ep_8 ep_10 ep_12 ep_15 ep_18 ep_20 ep_val_best \
      > ckpt/probe_aligned_r5_wksfull.log 2>&1 && break
    log "probe attempt $a rc=$?"
  done
  grep -vE "^WARNING" ckpt/probe_aligned_r5_wksfull.log | tail -13
  commit_paths "wksfull per-epoch aligned probe (final)" \
    ckpt/probe_aligned_r5_wksfull.log

  for a in 1 2 3; do
    timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
      --config scape_synth_wksfull > ckpt/test_synth_wksfull.log 2>&1 && break
    log "synth test attempt $a rc=$?"
  done
  timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
    --config scape_synth_wksfull \
    --feature-dir result/dvmatcher_scape_r_wksfull_scape_synth/feature \
    --corres-dir data/scape_synth/corres \
    --out result/dvmatcher_scape_r_wksfull_scape_synth/geodesic_error.json \
    >> ckpt/test_synth_wksfull.log 2>&1
  log "synth eval rc=$?"
  tail -2 ckpt/test_synth_wksfull.log
  commit_paths "Synth protocol eval (final): dvmatcher_scape_r_wksfull" \
    result/dvmatcher_scape_r_wksfull_scape_synth/geodesic_error.json \
    ckpt/test_synth_wksfull.log
fi

log "ALL DONE"
