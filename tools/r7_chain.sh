#!/bin/bash
# Round-3 chain #3: a third environment reset wiped the untracked caches and
# in-flight WKS/partial/combo protocol artifacts again. Lessons applied here:
#   (1) curve files are committed DURING training (10-min watcher), not only
#       at stage end, so a reset can never erase a protocol curve again;
#   (2) the WKS cache hard-links the geodesic/FPS artifacts from the plain
#       scape_r cache and only backfills the .feat.npy files (preprocess_split
#       is idempotent per artifact), halving preprocessing time;
#   (3) all git operations take a lock so the watcher cannot race foreground
#       commits.
# Stage order by evidence value: scape_r caches -> WKS protocol (anchored
# quality headline, the loop-closer BASELINE.md promises) -> partial protocol
# (VERDICT r2 item 7) -> combo -> final bench/suite logs.
cd /root/repo || exit 1
echo "[r7] start at $(date)"
echo $$ > /tmp/regen.pid

GITLOCK=/tmp/dvm_git.lock

latest_ep() { ls -d "$1"/ep_[0-9]* 2>/dev/null | sed 's/.*ep_//' | sort -n | tail -1; }

commit_evidence() {  # $1 message, rest: files
  msg="$1"; shift
  flock "$GITLOCK" bash -c '
    msg="$1"; shift
    added=0
    for f in "$@"; do [ -e "$f" ] && git add -f "$f" && added=1; done
    if [ "$added" = 1 ] && ! git diff --cached --quiet; then
      git commit -q -m "$msg" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[r7] committed: $msg"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$msg" "$@"
}

# -- background watcher: persist in-flight curves every 10 minutes
watcher() {
  while true; do
    sleep 600
    commit_evidence "Protocol curve checkpoint (auto-commit during training)" \
      ckpt/dvmatcher_scape_r_wks/metrics.jsonl \
      ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl \
      ckpt/dvmatcher_scape_r_wksdist/metrics.jsonl \
      ckpt/train_r3_wks.log ckpt/train_r3_partial.log ckpt/train_r3_wksdist.log
  done
}
watcher &
echo $! > /tmp/watcher.pid

# Resume a 20-epoch protocol run with auto-retry (host-RAM-creep OOMs die
# with rc=137; each resume restarts the host process from the latest
# checkpoint). Attempts 4+ fall back to the streaming feed.
run_protocol() {  # $1 config  $2 ckpt dir  $3 log
  for attempt in 1 2 3 4 5 6; do
    EP=$(latest_ep "$2")
    if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
    NOFUSE=""
    if [ "$attempt" -ge 4 ]; then NOFUSE="DVM_NO_FUSED_FEED=1"; fi
    RESUME=""
    if [ -n "$EP" ]; then RESUME="--resume ep_$EP"; fi
    echo "[r7] $1 attempt $attempt from ep_${EP:-0} ($NOFUSE) at $(date)"
    timeout 14400 env JAX_PLATFORMS=axon $NOFUSE python -u -m dvmatcher_tpu.cli.train \
      --config "$1" --use-kernel $RESUME >> "$3" 2>&1
    echo "[r7] $1 attempt $attempt rc=$? latest=ep_$(latest_ep "$2") at $(date)"
  done
}

# existing-checkpoint filter for probes (probe only epochs that exist)
eps_present() {  # $1 ckpt dir, rest: candidate tags
  d="$1"; shift
  for t in "$@"; do [ -d "$d/$t" ] && printf '%s ' "$t"; done
}

# ---- 0. scape_r FPS+geodesic cache (everything downstream needs it)
timeout 3600 python -u -m dvmatcher_tpu.cli.preprocess --config scape_r \
  --data-root data > ckpt/preproc_scape_r.log 2>&1
echo "[r7] scape_r cache rc=$? at $(date)"

# ---- 0b. WKS cache: hard-link geod/fps artifacts, backfill features
mkdir -p data/cache/scape_r_wks
for f in data/cache/scape_r/*; do
  ln -f "$f" "data/cache/scape_r_wks/$(basename "$f")" 2>/dev/null
done
timeout 7200 python -u -m dvmatcher_tpu.cli.preprocess --config scape_r_wks \
  --wks-features --data-root data > ckpt/preproc_wks.log 2>&1
echo "[r7] wks cache rc=$? at $(date)"

# ---- 0c. synth-benchmark WKS cache (probe + protocol-eval input)
timeout 3600 python -u tools/make_synth_wks_cache.py > ckpt/preproc_synth_wks.log 2>&1
echo "[r7] synth wks cache rc=$? at $(date)"

# ---- 1. WKS-anchored protocol (the anchored-quality headline)
run_protocol scape_r_wks ckpt/dvmatcher_scape_r_wks ckpt/train_r3_wks.log
echo "[r7] wks complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wks)"
commit_evidence "Regenerate WKS-anchored protocol curve (chain 3)" \
  ckpt/dvmatcher_scape_r_wks/metrics.jsonl ckpt/train_r3_wks.log

# ---- 2. WKS probe + file-based protocol eval
PROBE_EPS=$(eps_present ckpt/dvmatcher_scape_r_wks \
  ep_1 ep_3 ep_5 ep_8 ep_10 ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best)
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks $PROBE_EPS \
  > ckpt/probe_aligned_r3_wks.log 2>&1
echo "[r7] wks probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wks.log | tail -13

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wks > ckpt/test_synth_wks.log 2>&1
echo "[r7] wks synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wks \
  --feature-dir result/dvmatcher_scape_r_wks_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wks.log 2>&1
echo "[r7] wks synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_wks.log
commit_evidence "WKS protocol evidence: aligned probe + synth protocol eval" \
  ckpt/probe_aligned_r3_wks.log \
  result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json

# ---- 3. partial protocol (scape_partial, bs=5) — VERDICT r2 item 7
timeout 3600 python -u -m dvmatcher_tpu.cli.preprocess --config scape_partial \
  --data-root data > ckpt/preproc_partial.log 2>&1
echo "[r7] partial cache rc=$? at $(date)"
run_protocol scape_partial ckpt/dvmatcher_scape_partial_tpu ckpt/train_r3_partial.log
echo "[r7] partial complete: ep_$(latest_ep ckpt/dvmatcher_scape_partial_tpu)"
PROBE_EPS=$(eps_present ckpt/dvmatcher_scape_partial_tpu \
  ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best)
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_partial.py \
  $PROBE_EPS > ckpt/probe_partial_r3.log 2>&1
echo "[r7] partial probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_partial_r3.log | tail -9
commit_evidence "Partial protocol evidence: curve + partial-to-full probe" \
  ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl ckpt/probe_partial_r3.log

# ---- 4. combo protocol (WKS anchor + dist-only objective)
run_protocol scape_r_wksdist ckpt/dvmatcher_scape_r_wksdist ckpt/train_r3_wksdist.log
echo "[r7] wksdist complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wksdist)"
PROBE_EPS=$(eps_present ckpt/dvmatcher_scape_r_wksdist \
  ep_1 ep_3 ep_5 ep_10 ep_15 ep_20 ep_val_best)
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wksdist $PROBE_EPS \
  > ckpt/probe_aligned_r3_wksdist.log 2>&1
echo "[r7] wksdist probe rc=$? at $(date)"
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wksdist > ckpt/test_synth_wksdist.log 2>&1
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wksdist \
  --feature-dir result/dvmatcher_scape_r_wksdist_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wksdist.log 2>&1
echo "[r7] wksdist synth eval rc=$? at $(date)"
commit_evidence "Combo protocol (WKS anchor + dist-only objective): curve, probe, synth eval" \
  ckpt/dvmatcher_scape_r_wksdist/metrics.jsonl \
  ckpt/probe_aligned_r3_wksdist.log \
  result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json

# ---- 5. final bench + suite evidence
timeout 3600 env JAX_PLATFORMS=axon python -u bench.py > ckpt/bench_r3.log 2>&1
echo "[r7] bench rc=$?: $(tail -1 ckpt/bench_r3.log)"
timeout 5400 env JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -q -m "not slow" > ckpt/pytest_r3.log 2>&1
echo "[r7] pytest rc=$? at $(date)"; tail -2 ckpt/pytest_r3.log
commit_evidence "End-of-round evidence: headline bench + suite log" \
  ckpt/bench_r3.log ckpt/pytest_r3.log

kill "$(cat /tmp/watcher.pid)" 2>/dev/null
echo "[r7] ALL DONE at $(date)"
