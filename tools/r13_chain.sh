#!/bin/bash
# Round-5 chain 13: partial-to-full FILE-chain eval (the last piece of
# VERDICT-r4 item 1) — generate the partial file benchmark
# (tools/make_synth_partial.py), run cli.test over it with the
# partial-trained checkpoint, score with cli.evaluate --partial-ids, and
# commit benchmark + artifacts. Queues behind r12 (which ends with the
# wksfull stretch protocol).
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
log() { echo "[r13] $* at $(date)"; }
log "chain start"

commit_paths() {
  local msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    for p in "$@"; do git add -f "$p" 2>/dev/null; done
    if ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r13] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

P=$(cat /tmp/r12.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 120; done
log "r12 done"

if [ ! -d data/scape_synth_partial/shapes_test ]; then
  timeout 1800 python tools/make_synth_partial.py \
    > ckpt/make_synth_partial.log 2>&1
  log "benchmark gen rc=$?"
fi
commit_paths "Partial file-benchmark fixtures (template + crops + ids + GT)" \
  data/scape_synth_partial ckpt/make_synth_partial.log

RES=result/dvmatcher_scape_partial_tpu_scape_synth_partial
for a in 1 2 3; do
  timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
    --config scape_synth_partial >> ckpt/test_synth_partial.log 2>&1 && break
  log "partial file test attempt $a rc=$?"
  sleep 10
done
log "partial file test done"
for a in 1 2 3; do
  timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
    --config scape_synth_partial --feature-dir "$RES/feature" \
    --partial-ids data/scape_synth_partial/ids \
    --out "$RES/partial_geodesic_error.json" \
    >> ckpt/test_synth_partial.log 2>&1 && break
  log "partial file eval attempt $a rc=$?"
  sleep 10
done
log "partial file eval done"
grep -vE "^WARNING" ckpt/test_synth_partial.log | tail -8
commit_paths "Partial-to-full file-chain eval (scape_synth_partial)" \
  "$RES/partial_geodesic_error.json" ckpt/test_synth_partial.log

log "ALL DONE"
