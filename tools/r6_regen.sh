#!/bin/bash
# Round-3 regeneration chain, part 2: the second environment reset wiped
# the in-flight stage-4..6 artifacts of tools/r5_regen.sh (WKS-anchored
# protocol, combo protocol, partial protocol) before they were committed.
# Stages 1-3 (dist-only protocol, bf16 gate, registration) ARE committed
# and are not re-run. This chain runs only the missing stages, ordered by
# evidence value: WKS (anchored quality loop) -> partial protocol ->
# combo -> final bench/suite logs. Strictly sequential — one TPU.
cd /root/repo
echo "[regen2] start at $(date)"
echo $$ > /tmp/regen.pid

latest_ep() {
  ls -d "$1"/ep_[0-9]* 2>/dev/null | sed 's/.*ep_//' | sort -n | tail -1
}

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
    echo "[regen2] $1 attempt $attempt from ep_${EP:-0} ($NOFUSE) at $(date)"
    timeout 14400 env JAX_PLATFORMS=axon $NOFUSE python -u -m dvmatcher_tpu.cli.train \
      --config "$1" --use-kernel $RESUME >> "$3" 2>&1
    echo "[regen2] $1 attempt $attempt rc=$? latest=ep_$(latest_ep "$2") at $(date)"
  done
}

commit_evidence() {  # $1 message, rest: files
  msg="$1"; shift
  added=0
  for f in "$@"; do
    [ -e "$f" ] && git add -f "$f" && added=1
  done
  [ "$added" = 1 ] && git commit -q -m "$msg" \
    -m "No-Verification-Needed: evidence artifacts only, no source change" \
    && echo "[regen2] committed: $msg"
}

# ---- 4. WKS-anchored protocol (the anchored-quality headline)
timeout 7200 python -u -m dvmatcher_tpu.cli.preprocess --config scape_r_wks \
  --wks-features --data-root data > ckpt/preproc_wks.log 2>&1
echo "[regen2] wks cache rc=$? at $(date)"
run_protocol scape_r_wks ckpt/dvmatcher_scape_r_wks ckpt/train_r3_wks.log
echo "[regen2] wks complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wks)"
commit_evidence "Regenerate WKS-anchored protocol curve after second reset" \
  ckpt/dvmatcher_scape_r_wks/metrics.jsonl

timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks \
  ep_1 ep_3 ep_5 ep_8 ep_10 ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wks.log 2>&1
echo "[regen2] wks probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wks.log | tail -13

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wks > ckpt/test_synth_wks.log 2>&1
echo "[regen2] wks synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wks \
  --feature-dir result/dvmatcher_scape_r_wks_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wks.log 2>&1
echo "[regen2] wks synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_wks.log
commit_evidence "WKS protocol evidence: aligned probe + synth protocol eval" \
  ckpt/probe_aligned_r3_wks.log \
  result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json

# ---- 5. partial protocol (scape_partial, bs=5) — VERDICT r2 item 7
timeout 3600 python -u -m dvmatcher_tpu.cli.preprocess --config scape_partial \
  --data-root data > ckpt/preproc_partial.log 2>&1
echo "[regen2] partial cache rc=$? at $(date)"
run_protocol scape_partial ckpt/dvmatcher_scape_partial_tpu ckpt/train_r3_partial.log
echo "[regen2] partial complete: ep_$(latest_ep ckpt/dvmatcher_scape_partial_tpu)"
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_partial.py \
  ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best > ckpt/probe_partial_r3.log 2>&1
echo "[regen2] partial probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_partial_r3.log | tail -9
commit_evidence "Partial protocol evidence: curve + partial-to-full probe" \
  ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl ckpt/probe_partial_r3.log

# ---- 6. combo protocol (WKS anchor + dist-only objective)
run_protocol scape_r_wksdist ckpt/dvmatcher_scape_r_wksdist ckpt/train_r3_wksdist.log
echo "[regen2] wksdist complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wksdist)"
commit_evidence "Regenerate combo protocol curve" \
  ckpt/dvmatcher_scape_r_wksdist/metrics.jsonl
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wksdist \
  ep_1 ep_3 ep_5 ep_10 ep_15 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wksdist.log 2>&1
echo "[regen2] wksdist probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wksdist.log | tail -9
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wksdist > ckpt/test_synth_wksdist.log 2>&1
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wksdist \
  --feature-dir result/dvmatcher_scape_r_wksdist_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wksdist.log 2>&1
echo "[regen2] wksdist synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_wksdist.log
commit_evidence "Combo protocol (WKS anchor + dist-only objective): curve, probe, synth eval" \
  ckpt/dvmatcher_scape_r_wksdist/metrics.jsonl \
  ckpt/probe_aligned_r3_wksdist.log \
  result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json

# ---- 7. final bench + full suite evidence
timeout 3600 env JAX_PLATFORMS=axon python -u bench.py > ckpt/bench_r3.log 2>&1
echo "[regen2] bench rc=$? at $(date)"; tail -1 ckpt/bench_r3.log
timeout 5400 env JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -q -m "not slow" > ckpt/pytest_r3.log 2>&1
echo "[regen2] pytest rc=$? at $(date)"; tail -2 ckpt/pytest_r3.log
commit_evidence "End-of-round evidence: headline bench + full suite log" \
  ckpt/bench_r3.log ckpt/pytest_r3.log

echo "[regen2] ALL DONE at $(date)"
