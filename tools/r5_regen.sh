#!/bin/bash
# Round-3 regeneration chain: an environment reset wiped all untracked
# artifacts (trained checkpoints, probe logs, metrics curves) that the
# round-3 docs reference. This chain re-runs the two headline protocols
# (dist-only, WKS-anchored), their probes and file-based protocol evals,
# the bf16 gate, registration artifacts, and (time permitting) the combo
# + partial protocols — committing the small evidence files (force-added
# past the ckpt/ gitignore) as each stage lands so a future reset cannot
# erase them again. Strictly sequential — one TPU, one host core.
cd /root/repo
echo "[regen] start at $(date)"

latest_ep() {
  ls -d "$1"/ep_[0-9]* 2>/dev/null | sed 's/.*ep_//' | sort -n | tail -1
}

# Resume a 20-epoch protocol run with auto-retry (host-RAM-creep OOMs die
# with rc=137; each resume restarts the host process from the latest
# checkpoint). Attempts 3-4 fall back to the streaming feed.
run_protocol() {  # $1 config  $2 ckpt dir  $3 log
  for attempt in 1 2 3 4 5; do
    EP=$(latest_ep "$2")
    if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
    NOFUSE=""
    if [ "$attempt" -ge 4 ]; then NOFUSE="DVM_NO_FUSED_FEED=1"; fi
    RESUME=""
    if [ -n "$EP" ]; then RESUME="--resume ep_$EP"; fi
    echo "[regen] $1 attempt $attempt from ep_${EP:-0} ($NOFUSE) at $(date)"
    timeout 14400 env JAX_PLATFORMS=axon $NOFUSE python -u -m dvmatcher_tpu.cli.train \
      --config "$1" --use-kernel $RESUME >> "$3" 2>&1
    echo "[regen] $1 attempt $attempt rc=$? latest=ep_$(latest_ep "$2") at $(date)"
  done
}

commit_evidence() {  # $1 message, rest: files
  msg="$1"; shift
  for f in "$@"; do
    [ -e "$f" ] && git add -f "$f"
  done
  git commit -m "$msg" -m "No-Verification-Needed: evidence artifacts only, no source change" \
    >/dev/null 2>&1 && echo "[regen] committed: $msg"
}

# ---- 0. wait for any running preprocess, then ensure both caches exist
P=$(cat /tmp/preproc.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 30; done
timeout 3600 python -u -m dvmatcher_tpu.cli.preprocess --config scape_r \
  --data-root data >> ckpt/preproc_scape_r.log 2>&1
echo "[regen] scape_r cache rc=$? at $(date)"

# ---- 1. dist-only protocol (headline quality number, 0.068 in the docs)
run_protocol scape_r_distonly ckpt/dvmatcher_scape_r_distonly ckpt/train_r3_distonly.log
echo "[regen] distonly complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_distonly)"
commit_evidence "Regenerate dist-only protocol curve after environment reset" \
  ckpt/dvmatcher_scape_r_distonly/metrics.jsonl

timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly \
  ep_1 ep_2 ep_3 ep_5 ep_7 ep_10 ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_distonly.log 2>&1
echo "[regen] distonly probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_distonly.log | tail -14

timeout 1800 env JAX_PLATFORMS=axon python -u tools/probe_quality.py \
  --exp ckpt/dvmatcher_scape_r_distonly ep_1 ep_5 ep_10 ep_20 \
  > ckpt/probe_noise_r3_distonly.log 2>&1
echo "[regen] distonly noise probe rc=$? at $(date)"

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_distonly > ckpt/test_synth_distonly.log 2>&1
echo "[regen] distonly synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_distonly \
  --feature-dir result/dvmatcher_scape_r_distonly_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_distonly_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_distonly.log 2>&1
echo "[regen] distonly synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_distonly.log
commit_evidence "Dist-only protocol evidence: aligned/noise probes + synth protocol eval" \
  ckpt/probe_aligned_r3_distonly.log ckpt/probe_noise_r3_distonly.log \
  result/dvmatcher_scape_r_distonly_scape_synth/geodesic_error.json

# ---- 2. bf16 gate (pending followup: quality + throughput, both precisions)
timeout 2400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly ep_20 > ckpt/probe_bf16_gate.log 2>&1
echo "[regen] f32 gate probe rc=$? at $(date)"
timeout 2400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --bf16 \
  --exp ckpt/dvmatcher_scape_r_distonly ep_20 >> ckpt/probe_bf16_gate.log 2>&1
echo "[regen] bf16 gate probe rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon DVM_BENCH_DTYPE=bf16 python -u bench.py \
  > ckpt/bench_bf16.log 2>&1
echo "[regen] bf16 bench rc=$? at $(date)"; tail -1 ckpt/bench_bf16.log
commit_evidence "bf16 gate evidence: aligned probe at both precisions + bf16 bench" \
  ckpt/probe_bf16_gate.log ckpt/bench_bf16.log

# ---- 3. registration artifacts (dist-only backbone + reference deformer)
timeout 2400 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.deform \
  --config scape_r_distonly \
  --deformer-ref /root/reference/ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth \
  > ckpt/deform_r3_distonly.log 2>&1
echo "[regen] deform point rc=$? at $(date)"
timeout 2400 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.deform \
  --config scape_r_distonly --mesh \
  --deformer-ref /root/reference/ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth \
  >> ckpt/deform_r3_distonly.log 2>&1
echo "[regen] deform mesh rc=$? at $(date)"
grep -i deform ckpt/deform_r3_distonly.log | tail -4
commit_evidence "Registration artifacts: point + mesh modes, reference deformer weights" \
  ckpt/deform_r3_distonly.log result/deform

# ---- 4. WKS-anchored protocol (the 0.086 headline)
timeout 7200 python -u -m dvmatcher_tpu.cli.preprocess --config scape_r_wks \
  --wks-features --data-root data > ckpt/preproc_wks.log 2>&1
echo "[regen] wks cache rc=$? at $(date)"
run_protocol scape_r_wks ckpt/dvmatcher_scape_r_wks ckpt/train_r3_wks.log
echo "[regen] wks complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wks)"
commit_evidence "Regenerate WKS-anchored protocol curve after environment reset" \
  ckpt/dvmatcher_scape_r_wks/metrics.jsonl

timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks \
  ep_1 ep_3 ep_5 ep_8 ep_10 ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wks.log 2>&1
echo "[regen] wks probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wks.log | tail -13

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wks > ckpt/test_synth_wks.log 2>&1
echo "[regen] wks synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wks \
  --feature-dir result/dvmatcher_scape_r_wks_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wks.log 2>&1
echo "[regen] wks synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_wks.log
commit_evidence "WKS protocol evidence: aligned probe + synth protocol eval" \
  ckpt/probe_aligned_r3_wks.log \
  result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json

# ---- 5. combo protocol (WKS anchor + dist-only objective; undocumented yet)
run_protocol scape_r_wksdist ckpt/dvmatcher_scape_r_wksdist ckpt/train_r3_wksdist.log
echo "[regen] wksdist complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wksdist)"
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wksdist \
  ep_1 ep_3 ep_5 ep_10 ep_15 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wksdist.log 2>&1
echo "[regen] wksdist probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wksdist.log | tail -9
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wksdist > ckpt/test_synth_wksdist.log 2>&1
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wksdist \
  --feature-dir result/dvmatcher_scape_r_wksdist_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wksdist.log 2>&1
echo "[regen] wksdist synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_wksdist.log
commit_evidence "Combo protocol (WKS anchor + dist-only objective): curve, probe, synth eval" \
  ckpt/dvmatcher_scape_r_wksdist/metrics.jsonl \
  ckpt/probe_aligned_r3_wksdist.log \
  result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json

# ---- 6. partial protocol (scape_partial, bs=5)
timeout 3600 python -u -m dvmatcher_tpu.cli.preprocess --config scape_partial \
  --data-root data > ckpt/preproc_partial.log 2>&1
echo "[regen] partial cache rc=$? at $(date)"
run_protocol scape_partial ckpt/dvmatcher_scape_partial_tpu ckpt/train_r3_partial.log
echo "[regen] partial complete: ep_$(latest_ep ckpt/dvmatcher_scape_partial_tpu)"
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_partial.py \
  ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best > ckpt/probe_partial_r3.log 2>&1
echo "[regen] partial probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_partial_r3.log | tail -9
commit_evidence "Partial protocol evidence: curve + partial-to-full probe" \
  ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl ckpt/probe_partial_r3.log

# ---- 7. final bench + full suite evidence
timeout 3600 env JAX_PLATFORMS=axon python -u bench.py > ckpt/bench_r3.log 2>&1
echo "[regen] bench rc=$? at $(date)"; tail -1 ckpt/bench_r3.log
timeout 5400 env JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -x -q -m "not slow" > ckpt/pytest_r3.log 2>&1
echo "[regen] pytest rc=$? at $(date)"; tail -2 ckpt/pytest_r3.log
commit_evidence "End-of-round evidence: headline bench + full suite log" \
  ckpt/bench_r3.log ckpt/pytest_r3.log

echo "[regen] ALL DONE at $(date)"
