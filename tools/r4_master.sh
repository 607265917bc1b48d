#!/bin/bash
# Round-3 recovery master chain (session restart killed the previous
# queue): finishes the three open protocol runs, then all pending probes,
# protocol evals, artifact refreshes and the headline bench. Strictly
# sequential — one TPU, one host core.
cd /root/repo
echo "[master] start at $(date)"

latest_ep() {
  ls -d "$1"/ep_[0-9]* 2>/dev/null | sed 's/.*ep_//' | sort -n | tail -1
}

# Resume a 20-epoch protocol run with auto-retry (host-RAM-creep OOMs die
# with rc=137; each resume restarts the host process from the latest
# checkpoint). Attempts 3-4 fall back to the streaming feed.
run_protocol() {  # $1 config  $2 ckpt dir  $3 log
  for attempt in 1 2 3 4; do
    EP=$(latest_ep "$2")
    if [ -n "$EP" ] && [ "$EP" -ge 20 ]; then break; fi
    NOFUSE=""
    if [ "$attempt" -ge 3 ]; then NOFUSE="DVM_NO_FUSED_FEED=1"; fi
    echo "[master] $1 resume attempt $attempt from ep_${EP:-0} ($NOFUSE) at $(date)"
    timeout 14400 env JAX_PLATFORMS=axon $NOFUSE python -u -m dvmatcher_tpu.cli.train \
      --config "$1" --use-kernel --resume "ep_$EP" >> "$3" 2>&1
    echo "[master] $1 attempt $attempt rc=$? latest=ep_$(latest_ep "$2") at $(date)"
  done
}

# ---- 1. partial protocol ep_11 -> ep_20 (died mid-ep-12 with the session)
run_protocol scape_partial ckpt/dvmatcher_scape_partial_tpu ckpt/train_r3_partial.log
echo "[master] partial protocol complete: ep_$(latest_ep ckpt/dvmatcher_scape_partial_tpu)"

# ---- 2. WKS protocol ep_7 -> ep_20 (OOM-killed in chain2)
run_protocol scape_r_wks ckpt/dvmatcher_scape_r_wks ckpt/train_r3_wks_resume.log
echo "[master] wks protocol complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_wks)"

# ---- 3. distonly protocol ep_10 -> ep_20 (curve still improving at ep_10)
run_protocol scape_r_distonly ckpt/dvmatcher_scape_r_distonly ckpt/train_r3_distonly3.log
echo "[master] distonly protocol complete: ep_$(latest_ep ckpt/dvmatcher_scape_r_distonly)"

# ---- 4. probes
timeout 3600 env JAX_PLATFORMS=axon python -u tools/probe_partial.py \
  ep_1 ep_5 ep_10 ep_15 ep_20 ep_val_best \
  > ckpt/probe_partial_r3.log 2>&1
echo "[master] partial probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_partial_r3.log | tail -9

timeout 2400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks \
  ep_8 ep_10 ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wks20.log 2>&1
echo "[master] wks 20ep probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wks20.log | tail -9

timeout 2400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly \
  ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_distonly20.log 2>&1
echo "[master] distonly 20ep probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_distonly20.log | tail -8

timeout 1800 env JAX_PLATFORMS=axon python -u tools/probe_quality.py \
  --exp ckpt/dvmatcher_scape_r_distonly ep_1 ep_5 ep_10 ep_20 \
  > ckpt/probe_noise_r3_distonly.log 2>&1
echo "[master] distonly noise probe rc=$? at $(date)"

# ---- 5. file-based protocol evals (final checkpoints)
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_distonly > ckpt/test_synth_distonly.log 2>&1
echo "[master] distonly synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_distonly \
  --feature-dir result/dvmatcher_scape_r_distonly_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_distonly_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_distonly.log 2>&1
echo "[master] distonly synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_distonly.log

# WKS final-epoch eval via a tag copy (ep_val_best can stay early by the
# reference's val-selection semantics; evaluate ep_20 separately)
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
  timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
    --config /tmp/scape_synth_wks_ep20.yaml > ckpt/test_synth_wks20.log 2>&1
  echo "[master] wks ep20 synth test rc=$? at $(date)"
  timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
    --config /tmp/scape_synth_wks_ep20.yaml \
    --feature-dir result/dvmatcher_scape_r_wks_ep20_scape_synth/feature \
    --corres-dir data/scape_synth/corres \
    --out result/dvmatcher_scape_r_wks_ep20_scape_synth/geodesic_error.json \
    >> ckpt/test_synth_wks20.log 2>&1
  echo "[master] wks ep20 synth eval rc=$? at $(date)"
  tail -3 ckpt/test_synth_wks20.log
fi

# ---- 6. SCAPE_r inference artifact refresh with final models
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_distonly > ckpt/test_r3_distonly.log 2>&1
echo "[master] distonly scape_r artifacts rc=$? at $(date)"
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_nodino > ckpt/test_r3_nodino.log 2>&1
echo "[master] nodino scape_r artifact refresh rc=$? at $(date)"
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_wks > ckpt/test_r3_wks.log 2>&1
echo "[master] wks scape_r artifacts rc=$? at $(date)"

# ---- 7. headline bench + batch-size sweep
timeout 3600 env JAX_PLATFORMS=axon python -u bench.py > ckpt/bench_r3.log 2>&1
echo "[master] bench rc=$? at $(date)"
tail -1 ckpt/bench_r3.log
timeout 3600 env JAX_PLATFORMS=axon python -u tools/bench_sweep.py \
  > ckpt/bench_sweep_r3.log 2>&1
echo "[master] bench sweep rc=$? at $(date)"
tail -8 ckpt/bench_sweep_r3.log

echo "[master] ALL DONE at $(date)"
