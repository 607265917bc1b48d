#!/bin/bash
# Round-5 follow-up chain. Queues behind r9b (wksdist stretch) and r9c
# (probe-best epilogue), then closes the remaining VERDICT-r4 evidence
# gaps on the single TPU, strictly sequentially:
#   1. partial-protocol quality probe RETRY (the first run was killed by
#      the hang watchdog as a stuck axon RPC after printing baselines)
#   2. dist-only aligned probe + file-chain synth eval RERUN with the
#      committed precision-tied selection kernel (the round-4-regen
#      numbers were produced by an uncommitted fp-12 working tree)
#   3. piecewise bench breakdown (import bug fixed) + kernel microbench
#      (quantifies the fp-16 selection win vs the r4 15.70 ms figure)
#   4. hard-setting noise sweep: rotate=True at sigma 0.02 and 0.03
#      (reference dataset_preprocess_noise.py:70-74 uses {.01,.02,.03})
#   5. wksdist file-chain synth eval at val_best
#   6. headline bench on an idle chip (provenance-controlled)
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
log() { echo "[r10] $* at $(date)"; }
log "chain start"

commit_paths() {  # $1 message, rest = paths
  local msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    for p in "$@"; do git add -f "$p" 2>/dev/null; done
    if ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r10] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

for PF in /tmp/r9b.pid /tmp/r9c.pid; do
  P=$(cat "$PF" 2>/dev/null)
  while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 120; done
done
log "prior chains done"

retry_tpu() {  # $1 timeout  $2 log  $3... cmd — retries stochastic axon hangs
  local T=$1 LOG=$2; shift 2
  for a in 1 2 3; do
    timeout "$T" env JAX_PLATFORMS=axon "$@" >> "$LOG" 2>&1 && return 0
    log "attempt $a rc=$? for $LOG"
    sleep 10
  done
  return 1
}

synth_eval() {  # $1 synth config  $2 expname  $3 log suffix
  retry_tpu 3600 "ckpt/test_synth_${2}_${3}.log" \
    python -u -m dvmatcher_tpu.cli.test --config "$1"
  log "synth test $2 ($3) rc=$?"
  retry_tpu 1800 "ckpt/test_synth_${2}_${3}.log" \
    python -u -m dvmatcher_tpu.cli.evaluate --config "$1" \
    --feature-dir "result/${2}_scape_synth/feature" \
    --corres-dir data/scape_synth/corres \
    --out "result/${2}_scape_synth/geodesic_error.json"
  log "synth eval $2 ($3) rc=$?"
  tail -2 "ckpt/test_synth_${2}_${3}.log"
  commit_paths "Synth protocol eval ($3): $2" \
    "result/${2}_scape_synth/geodesic_error.json" "ckpt/test_synth_${2}_${3}.log"
}

# ---------- 1. partial probe retry ----------
retry_tpu 3000 ckpt/probe_partial_r5.log python -u tools/probe_partial.py \
  ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best
log "partial probe rc=$?"
grep -vE "^WARNING" ckpt/probe_partial_r5.log | tail -10
commit_paths "Partial protocol per-epoch quality probe (retry after RPC hang)" \
  ckpt/probe_partial_r5.log

# ---------- 2. dist-only probe + eval, committed kernel ----------
retry_tpu 3600 ckpt/probe_aligned_r5_distonly.log python -u tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly ep_10 ep_15 ep_20 ep_val_best
log "distonly probe (fp-16 kernel) rc=$?"
grep -vE "^WARNING" ckpt/probe_aligned_r5_distonly.log | tail -7
commit_paths "Dist-only aligned probe rerun on the committed fp-16 kernel" \
  ckpt/probe_aligned_r5_distonly.log
synth_eval scape_synth_distonly dvmatcher_scape_r_distonly r5
if [ -s ckpt/probe_aligned_r5_distonly.log ]; then
  bash tools/eval_best_epoch.sh ckpt/probe_aligned_r5_distonly.log \
    ckpt/dvmatcher_scape_r_distonly scape_synth_distonly distonly_r5 2>&1
  log "distonly best-epoch eval rc=$?"
fi

# ---------- 3. breakdown + kernel microbench ----------
retry_tpu 1800 ckpt/bench_breakdown_r5.log python -u tools/bench_breakdown.py
log "bench breakdown rc=$?"
grep -vE "^WARNING" ckpt/bench_breakdown_r5.log | tail -10
retry_tpu 1800 ckpt/bench_kernel_r5.log python -u tools/bench_kernel.py
log "kernel bench (fp-16) rc=$?"
grep -vE "^WARNING" ckpt/bench_kernel_r5.log | tail -8
commit_paths "Bench breakdown (import fix) + kernel microbench on fp-16 selection" \
  ckpt/bench_breakdown_r5.log ckpt/bench_kernel_r5.log

# ---------- 4. hard noise sweep ----------
for SIG in 0.02 0.03; do
  D="data/scape_synth_hard_s${SIG#0.}"
  if [ ! -d "$D/shapes_test" ]; then
    timeout 3600 python tools/make_synth_gt.py --rotate --noise "$SIG" \
      --out "$D" > "ckpt/make_synth_hard_s${SIG#0.}.log" 2>&1
    log "hard synth sigma=$SIG gen rc=$?"
  fi
  retry_tpu 3600 "ckpt/probe_hard_s${SIG#0.}_distonly.log" \
    python -u tools/probe_aligned.py --bench "$D" \
    --exp ckpt/dvmatcher_scape_r_distonly ep_15 ep_val_best
  log "hard probe distonly sigma=$SIG rc=$?"
  retry_tpu 3600 "ckpt/probe_hard_s${SIG#0.}_wks.log" \
    python -u tools/probe_aligned.py --wks 128 --bench "$D" \
    --exp ckpt/dvmatcher_scape_r_wks ep_val_best
  log "hard probe wks sigma=$SIG rc=$?"
  grep -vE "^WARNING" "ckpt/probe_hard_s${SIG#0.}_distonly.log" | tail -5
  grep -vE "^WARNING" "ckpt/probe_hard_s${SIG#0.}_wks.log" | tail -5
  commit_paths "Hard benchmark sigma=$SIG (rotate=True): probes" \
    "ckpt/probe_hard_s${SIG#0.}_distonly.log" \
    "ckpt/probe_hard_s${SIG#0.}_wks.log" "ckpt/make_synth_hard_s${SIG#0.}.log"
done

# ---------- 5. wksdist synth eval at val_best ----------
if [ -d ckpt/dvmatcher_scape_r_wksdist/ep_val_best ]; then
  synth_eval scape_synth_wksdist dvmatcher_scape_r_wksdist r5
fi

# ---------- 6. headline bench, idle chip ----------
sleep 30
retry_tpu 3600 ckpt/bench_r5.log python -u bench.py
log "headline bench rc=$?"
tail -1 ckpt/bench_r5.log
commit_paths "Headline bench (round 5, fp-16 selection, idle chip)" ckpt/bench_r5.log

log "ALL DONE"
