#!/bin/bash
# Round-5 stretch chain: the LAST untried full-objective recipe —
# scape_r_wksfull (WKS anchor + full Pi-group objective + 10x dist-term
# emphasis; single-knob change vs scape_r_wks, see the config header).
# Queues behind tools/r10_chain.sh; the ckpt watcher commits epochs as
# they land, so a round boundary mid-run still ships partial evidence.
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
log() { echo "[r11] $* at $(date)"; }
log "chain start"

commit_paths() {
  local msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    for p in "$@"; do git add -f "$p" 2>/dev/null; done
    if ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r11] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

P=$(cat /tmp/r10.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 120; done
log "r10 done"

latest_ep() {
  ls -d "$1"/ep_[0-9]* 2>/dev/null | grep -E 'ep_[0-9]+$' \
    | sed 's/.*ep_//' | sort -n | tail -1
}

for attempt in 1 2 3; do
  EP=$(latest_ep ckpt/dvmatcher_scape_r_wksfull)
  if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
  RESUME=""
  if [ -n "$EP" ]; then RESUME="--resume ep_$EP"; fi
  log "wksfull attempt $attempt from ep_${EP:-0}"
  timeout 10800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
    --config scape_r_wksfull --use-kernel $RESUME \
    >> ckpt/train_r5_wksfull.log 2>&1
  log "wksfull attempt $attempt rc=$? latest=ep_$(latest_ep ckpt/dvmatcher_scape_r_wksfull)"
done
commit_paths "wksfull protocol (dist-emphasized full objective): curve + log" \
  ckpt/train_r5_wksfull.log ckpt/dvmatcher_scape_r_wksfull/metrics.jsonl
commit_paths "wksfull val-best weights" ckpt/dvmatcher_scape_r_wksfull/ep_val_best

EP=$(latest_ep ckpt/dvmatcher_scape_r_wksfull)
if [ -n "$EP" ] && [ "$EP" -ge 5 ]; then
  for a in 1 2 3; do
    timeout 5400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
      --exp ckpt/dvmatcher_scape_r_wksfull \
      ep_1 ep_2 ep_3 ep_5 ep_8 ep_10 ep_12 ep_15 ep_18 ep_20 ep_val_best \
      > ckpt/probe_aligned_r5_wksfull.log 2>&1 && break
    log "wksfull probe attempt $a rc=$?"
  done
  grep -vE "^WARNING" ckpt/probe_aligned_r5_wksfull.log | tail -13
  commit_paths "wksfull per-epoch aligned probe" ckpt/probe_aligned_r5_wksfull.log

  for a in 1 2 3; do
    timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
      --config scape_synth_wksfull > ckpt/test_synth_wksfull.log 2>&1 && break
    log "wksfull synth test attempt $a rc=$?"
  done
  timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
    --config scape_synth_wksfull \
    --feature-dir result/dvmatcher_scape_r_wksfull_scape_synth/feature \
    --corres-dir data/scape_synth/corres \
    --out result/dvmatcher_scape_r_wksfull_scape_synth/geodesic_error.json \
    >> ckpt/test_synth_wksfull.log 2>&1
  log "wksfull synth eval rc=$?"
  tail -2 ckpt/test_synth_wksfull.log
  commit_paths "Synth protocol eval: dvmatcher_scape_r_wksfull" \
    result/dvmatcher_scape_r_wksfull_scape_synth/geodesic_error.json \
    ckpt/test_synth_wksfull.log
fi

log "ALL DONE"
