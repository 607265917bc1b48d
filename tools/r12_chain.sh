#!/bin/bash
# Round-5 chain 12. Replaces the original r11 queue position: waits on
# r10, then (a) hard-setting probes for the NEW quality headline
# (wksdist, 0.0260 easy) across all three reference noise levels
# sigma in {0.01, 0.02, 0.03} with rotate=True — is the combo still the
# king in the regime where extrinsic cues break? (reference recipe:
# dataset_preprocess_rotate.py:51,59 + dataset_preprocess_noise.py:70-74)
# — (b) commits the s02/s03 hard benchmark fixtures r10 generated, then
# (c) chains into tools/r11_chain.sh (wksfull stretch protocol), whose
# own r10 wait-loop exits immediately since r10 is done.
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
log() { echo "[r12] $* at $(date)"; }
log "chain start"

commit_paths() {
  local msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    for p in "$@"; do git add -f "$p" 2>/dev/null; done
    if ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r12] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

P=$(cat /tmp/r10.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 120; done
log "r10 done"

retry_tpu() {  # $1 timeout  $2 log  $3... cmd
  local T=$1 LOG=$2; shift 2
  for a in 1 2 3; do
    timeout "$T" env JAX_PLATFORMS=axon "$@" >> "$LOG" 2>&1 && return 0
    log "attempt $a rc=$? for $LOG"
    sleep 10
  done
  return 1
}

# ---------- (a) wksdist hard probes, all sigma levels ----------
for TAG in hard hard_s02 hard_s03; do
  D="data/scape_synth_${TAG}"
  [ -d "$D/shapes_test" ] || { log "skip $TAG (no data)"; continue; }
  retry_tpu 3600 "ckpt/probe_${TAG}_wksdist.log" \
    python -u tools/probe_aligned.py --wks 128 --bench "$D" \
    --exp ckpt/dvmatcher_scape_r_wksdist ep_15 ep_20 ep_val_best
  log "wksdist probe $TAG rc=$?"
  grep -vE "^WARNING" "ckpt/probe_${TAG}_wksdist.log" | tail -6
  commit_paths "Hard-setting probe ($TAG): wksdist headline checkpoint" \
    "ckpt/probe_${TAG}_wksdist.log"
done

# ---------- (b) commit s02/s03 fixtures (geo_cache gitignored) ----------
for S in s02 s03; do
  D="data/scape_synth_hard_${S}"
  [ -d "$D/shapes_test" ] && commit_paths \
    "Hard benchmark fixtures sigma=0.${S#s} (shapes + GT)" \
    "$D/shapes_test" "$D/corres" "$D/shapes_train"
done

# ---------- (c) wksfull stretch ----------
bash tools/r11_chain.sh
log "ALL DONE"
