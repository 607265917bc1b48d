#!/bin/bash
# Round-3 followup chain: waits for the r4 master chain to release the
# TPU, then runs the combo experiment (WKS input anchor + dist-only
# objective), its probes + synth protocol eval, the piecewise bench
# breakdown, and registration artifacts pairing the dist-only backbone
# with the reference's shipped trained deformer. Strictly sequential —
# one TPU, one host core.
cd /root/repo
echo "[followup] start at $(date)"

MASTER_PID=$(cat /tmp/r4_master.pid 2>/dev/null)
while [ -n "$MASTER_PID" ] && kill -0 "$MASTER_PID" 2>/dev/null; do
  sleep 60
done
echo "[followup] master chain done at $(date)"

latest_ep() {
  ls -d "$1"/ep_[0-9]* 2>/dev/null | sed 's/.*ep_//' | sort -n | tail -1
}

# ---- 1. combo protocol (scape_r_wksdist, 20 epochs, retry on OOM)
for attempt in 1 2 3 4; do
  EP=$(latest_ep ckpt/dvmatcher_scape_r_wksdist)
  if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
  NOFUSE=""
  if [ "$attempt" -ge 3 ]; then NOFUSE="DVM_NO_FUSED_FEED=1"; fi
  RESUME=""
  if [ -n "$EP" ]; then RESUME="--resume ep_$EP"; fi
  echo "[followup] wksdist attempt $attempt from ep_${EP:-0} ($NOFUSE) at $(date)"
  timeout 14400 env JAX_PLATFORMS=axon $NOFUSE python -u -m dvmatcher_tpu.cli.train \
    --config scape_r_wksdist --use-kernel $RESUME >> ckpt/train_r3_wksdist.log 2>&1
  echo "[followup] wksdist attempt $attempt rc=$? latest=ep_$(latest_ep ckpt/dvmatcher_scape_r_wksdist) at $(date)"
done
echo "[followup] wksdist protocol complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wksdist)"

# ---- 2. aligned-GT probe per checkpoint
timeout 2400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wksdist \
  ep_1 ep_3 ep_5 ep_10 ep_15 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wksdist.log 2>&1
echo "[followup] wksdist probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wksdist.log | tail -10

# ---- 3. file-based synth protocol eval (full cli.test -> cli.evaluate)
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wksdist > ckpt/test_synth_wksdist.log 2>&1
echo "[followup] wksdist synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wksdist \
  --feature-dir result/dvmatcher_scape_r_wksdist_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wksdist_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wksdist.log 2>&1
echo "[followup] wksdist synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_wksdist.log

# ---- 4. piecewise bench breakdown (perf-push evidence)
timeout 1800 env JAX_PLATFORMS=axon python -u tools/bench_breakdown.py \
  > ckpt/bench_breakdown_r3.log 2>&1
echo "[followup] bench breakdown rc=$? at $(date)"
grep -v WARNING ckpt/bench_breakdown_r3.log | tail -6

# ---- 5. registration artifacts: dist-only backbone + reference deformer
timeout 2400 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.deform \
  --config scape_r_distonly \
  --deformer-ref /root/reference/ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth \
  > ckpt/deform_r3_distonly.log 2>&1
echo "[followup] deform point rc=$? at $(date)"
timeout 2400 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.deform \
  --config scape_r_distonly --mesh \
  --deformer-ref /root/reference/ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth \
  >> ckpt/deform_r3_distonly.log 2>&1
echo "[followup] deform mesh rc=$? at $(date)"
grep deform ckpt/deform_r3_distonly.log | tail -4

echo "[followup] ALL DONE at $(date)"
