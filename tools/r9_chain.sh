#!/bin/bash
# Round-4 master chain. Strictly sequential on the single TPU; the partial
# cache build runs on the host core in parallel (kicked off by the caller).
# Order = VERDICT r3 priority: (1) finish the WKS-anchored protocol with a
# per-epoch aligned probe + the file-based synth eval; (2) partial protocol
# for real; (3) regenerate + commit the dist-only headline weights; then
# hard-setting synth benchmark, artifact refresh, headline bench.
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
log() { echo "[r9] $* at $(date)"; }
log "chain start"

latest_ep() {
  ls -d "$1"/ep_[0-9]* 2>/dev/null | grep -E 'ep_[0-9]+$' \
    | sed 's/.*ep_//' | sort -n | tail -1
}

commit_paths() {  # $1 message, rest = paths (each added separately)
  local msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    for p in "$@"; do git add -f "$p" 2>/dev/null; done
    if ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r9] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

run_protocol() {  # $1 config  $2 ckpt dir  $3 log — resume when possible
  for attempt in 1 2 3 4; do
    EP=$(latest_ep "$2")
    if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
    RESUME=""
    if [ -n "$EP" ]; then RESUME="--resume ep_$EP"; fi
    NOFUSE=""
    if [ "$attempt" -ge 3 ]; then NOFUSE="DVM_NO_FUSED_FEED=1"; fi
    log "$1 attempt $attempt from ep_${EP:-0} ($NOFUSE)"
    timeout 14400 env JAX_PLATFORMS=axon $NOFUSE python -u -m dvmatcher_tpu.cli.train \
      --config "$1" --use-kernel $RESUME >> "$3" 2>&1
    log "$1 attempt $attempt rc=$? latest=ep_$(latest_ep "$2")"
  done
}

synth_eval() {  # $1 synth config name/path  $2 expname (result dir prefix)
  timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
    --config "$1" > "ckpt/test_synth_$2.log" 2>&1
  log "synth test $2 rc=$?"
  timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
    --config "$1" \
    --feature-dir "result/${2}_scape_synth/feature" \
    --corres-dir data/scape_synth/corres \
    --out "result/${2}_scape_synth/geodesic_error.json" \
    >> "ckpt/test_synth_$2.log" 2>&1
  log "synth eval $2 rc=$?"
  tail -2 "ckpt/test_synth_$2.log"
  commit_paths "Synth protocol eval: $2" \
    "result/${2}_scape_synth/geodesic_error.json" "ckpt/test_synth_$2.log"
}

# ---------- 1. WKS protocol -> ep_20 ----------
# A round-3 training process (from-scratch scape_r_wks, PID in
# /tmp/wks_live.pid) SURVIVED the round transition and owns this run —
# wait for it rather than racing it; resume via run_protocol only if it
# dies short of ep_20.
LIVE=$(cat /tmp/wks_live.pid 2>/dev/null)
while [ -n "$LIVE" ] && kill -0 "$LIVE" 2>/dev/null; do
  EP=$(latest_ep ckpt/dvmatcher_scape_r_wks)
  [ -n "$EP" ] && [ "$EP" -ge 20 ] && break
  sleep 120
done
run_protocol scape_r_wks ckpt/dvmatcher_scape_r_wks ckpt/train_r4_wks.log
log "wks protocol complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wks)"
commit_paths "WKS protocol: training log + curve (round 4 resume)" \
  ckpt/train_r4_wks.log ckpt/dvmatcher_scape_r_wks/metrics.jsonl

# ---------- 1.5 kernel microbench + ablation (VERDICT weak #3) ----------
timeout 1800 env JAX_PLATFORMS=axon python -u tools/bench_kernel.py \
  > ckpt/bench_kernel_r4.log 2>&1
log "kernel bench rc=$?"
cat ckpt/bench_kernel_r4.log
timeout 1800 env JAX_PLATFORMS=axon python -u tools/bench_kernel_ablate.py \
  > ckpt/bench_kernel_ablate_r4.log 2>&1
log "kernel ablate rc=$?"
cat ckpt/bench_kernel_ablate_r4.log
commit_paths "Kernel microbench + component ablation (round 4)" \
  ckpt/bench_kernel_r4.log ckpt/bench_kernel_ablate_r4.log

# ---------- 2. WKS PER-EPOCH aligned probe (VERDICT weak #2) ----------
timeout 9000 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks \
  ep_1 ep_2 ep_3 ep_4 ep_5 ep_6 ep_7 ep_8 ep_9 ep_10 ep_11 ep_12 ep_13 \
  ep_14 ep_15 ep_16 ep_17 ep_18 ep_19 ep_20 ep_val_best \
  > ckpt/probe_aligned_r4_wks.log 2>&1
log "wks per-epoch probe rc=$?"
grep -v WARNING ckpt/probe_aligned_r4_wks.log | tail -24
commit_paths "WKS per-epoch aligned-GT probe (round 4)" ckpt/probe_aligned_r4_wks.log

# ---------- 3. WKS file-based synth protocol eval (val_best + ep_20) ----------
synth_eval scape_synth_wks dvmatcher_scape_r_wks
if [ -d ckpt/dvmatcher_scape_r_wks/ep_20 ]; then
  rm -rf ckpt/dvmatcher_scape_r_wks_ep20
  mkdir -p ckpt/dvmatcher_scape_r_wks_ep20
  cp -r ckpt/dvmatcher_scape_r_wks/ep_20 ckpt/dvmatcher_scape_r_wks_ep20/ep_val_best
  python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("dvmatcher_tpu/configs/scape_synth_wks.yaml"))
cfg["expname"] = "dvmatcher_scape_r_wks_ep20"
yaml.safe_dump(cfg, open("/tmp/scape_synth_wks_ep20.yaml", "w"))
EOF
  synth_eval /tmp/scape_synth_wks_ep20.yaml dvmatcher_scape_r_wks_ep20
fi

# ---------- 4. partial protocol (VERDICT missing #2) ----------
# wait (bounded) for the host-side cache build kicked off in parallel
for i in $(seq 1 90); do
  [ -f /tmp/partial_cache.done ] && break
  sleep 60
done
log "partial cache wait done (flag: $(ls /tmp/partial_cache.done 2>/dev/null))"
run_protocol scape_partial ckpt/dvmatcher_scape_partial_tpu ckpt/train_r4_partial.log
log "partial protocol complete: ep_$(latest_ep ckpt/dvmatcher_scape_partial_tpu)"
commit_paths "Partial protocol: training log + curve (round 4)" \
  ckpt/train_r4_partial.log ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl

timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_partial.py \
  ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best \
  > ckpt/probe_partial_r4.log 2>&1
log "partial probe rc=$?"
grep -v WARNING ckpt/probe_partial_r4.log | tail -10
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_partial > ckpt/test_r4_partial.log 2>&1
log "partial test rc=$?"
commit_paths "Partial protocol probe + inference artifacts (round 4)" \
  ckpt/probe_partial_r4.log ckpt/test_r4_partial.log \
  result/dvmatcher_scape_partial_tpu

# ---------- 5. dist-only regen (VERDICT missing #3: committed weights) ----------
run_protocol scape_r_distonly ckpt/dvmatcher_scape_r_distonly ckpt/train_r4_distonly.log
log "distonly protocol complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_distonly)"
commit_paths "Dist-only protocol regen: training log + curve (round 4)" \
  ckpt/train_r4_distonly.log ckpt/dvmatcher_scape_r_distonly/metrics.jsonl
# the watcher commits ep_N as they appear; make sure val_best lands too
commit_paths "Dist-only val-best weights (headline checkpoint)" \
  ckpt/dvmatcher_scape_r_distonly/ep_val_best

timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly \
  ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best \
  > ckpt/probe_aligned_r4_distonly.log 2>&1
log "distonly probe rc=$?"
grep -v WARNING ckpt/probe_aligned_r4_distonly.log | tail -9
commit_paths "Dist-only aligned probe (round 4 regen)" ckpt/probe_aligned_r4_distonly.log
synth_eval scape_synth_distonly dvmatcher_scape_r_distonly

# ---------- 6. HARD synth benchmark (rotate + noise; VERDICT weak #4) ----------
if [ ! -d data/scape_synth_hard/shapes_test ]; then
  timeout 3600 python tools/make_synth_gt.py --rotate --noise 0.01 \
    --out data/scape_synth_hard > ckpt/make_synth_hard.log 2>&1
  log "hard synth gen rc=$?"
fi
timeout 7200 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py \
  --bench data/scape_synth_hard \
  --exp ckpt/dvmatcher_scape_r_distonly ep_20 ep_val_best \
  > ckpt/probe_hard_distonly.log 2>&1
log "hard probe distonly rc=$?"
timeout 7200 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --bench data/scape_synth_hard \
  --exp ckpt/dvmatcher_scape_r_wks ep_20 ep_val_best \
  > ckpt/probe_hard_wks.log 2>&1
log "hard probe wks rc=$?"
grep -v WARNING ckpt/probe_hard_distonly.log | tail -6
grep -v WARNING ckpt/probe_hard_wks.log | tail -7
commit_paths "Hard-setting synth benchmark (rotate=True, sigma=0.01): probes" \
  ckpt/probe_hard_distonly.log ckpt/probe_hard_wks.log ckpt/make_synth_hard.log

# ---------- 7. SCAPE_r inference artifact refresh (final models) ----------
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_distonly > ckpt/test_r4_distonly.log 2>&1
log "distonly scape_r artifacts rc=$?"
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_wks > ckpt/test_r4_wks.log 2>&1
log "wks scape_r artifacts rc=$?"
commit_paths "SCAPE_r inference artifact refresh (round-4 final checkpoints)" \
  ckpt/test_r4_distonly.log ckpt/test_r4_wks.log

# ---------- 8. headline bench ----------
timeout 3600 env JAX_PLATFORMS=axon python -u bench.py > ckpt/bench_r4.log 2>&1
log "bench rc=$?"
tail -1 ckpt/bench_r4.log
commit_paths "Headline bench (round 4)" ckpt/bench_r4.log

log "ALL DONE"
