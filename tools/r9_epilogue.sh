#!/bin/bash
# Round-4 epilogue: waits for tools/r9_followup.sh (PID in /tmp/r9b.pid) to
# release the TPU, then runs the file-based synth protocol eval at the
# PROBE-BEST epoch of every protocol whose probe-best differs from
# val_best (tools/eval_best_epoch.sh) — the aligned probe measures
# descriptor quality directly, while val-best selection compares losses
# at different annealed alphas and can land elsewhere.
cd /root/repo || exit 1
log() { echo "[r9c] $* at $(date)"; }
log "epilogue start"

B_PID=$(cat /tmp/r9b.pid 2>/dev/null)
while [ -n "$B_PID" ] && kill -0 "$B_PID" 2>/dev/null; do
  sleep 120
done
log "followup chain done"

# distonly: round-3 probe had ep_18 (.0586) beating val_best (.0610);
# use the round-4 regen probe when it exists, else the r3 one.
PROBE=ckpt/probe_aligned_r4_distonly.log
[ -s "$PROBE" ] || PROBE=ckpt/probe_aligned_r3_ep11_20.log
if [ -s "$PROBE" ]; then
  bash tools/eval_best_epoch.sh "$PROBE" ckpt/dvmatcher_scape_r_distonly \
    scape_synth_distonly distonly 2>&1
  log "distonly best-epoch eval rc=$?"
fi

# wksdist stretch protocol (if its probe ran)
if [ -s ckpt/probe_aligned_r4_wksdist.log ]; then
  bash tools/eval_best_epoch.sh ckpt/probe_aligned_r4_wksdist.log \
    ckpt/dvmatcher_scape_r_wksdist scape_synth_wksdist wksdist 2>&1
  log "wksdist best-epoch eval rc=$?"
fi

log "ALL DONE"
