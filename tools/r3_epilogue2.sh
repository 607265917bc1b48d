#!/bin/bash
# Stage 2 after tools/r3_epilogue.sh: the dist-only curve was still
# improving at ep_10 (0.0677 aligned) — finish its 20-epoch protocol,
# re-probe, refresh the file-based synth eval with the final best
# checkpoint, and sweep the bench batch size.
cd /root/repo
# runs LAST: after the WKS protocol completion (stage 3)
while ! grep -q "\[epilogue3\] done" ckpt/r3_epilogue3.log 2>/dev/null; do sleep 60; done
echo "[epilogue2] stage-3 done at $(date)"

timeout 7200 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
  --config scape_r_distonly --use-kernel --resume ep_10 \
  > ckpt/train_r3_distonly3.log 2>&1
RC=$?
echo "[epilogue2] distonly 20ep rc=$RC at $(date)"
if [ "$RC" -ne 0 ]; then
  # first TPU exposure of the fused-resident feed — fall back to the
  # streaming feed and resume from wherever it died
  EP=$(ls -d ckpt/dvmatcher_scape_r_distonly/ep_[0-9]* | sed 's/.*ep_//' | sort -n | tail -1)
  timeout 7200 env JAX_PLATFORMS=axon DVM_NO_FUSED_FEED=1 \
    python -u -m dvmatcher_tpu.cli.train \
    --config scape_r_distonly --use-kernel --resume "ep_$EP" \
    >> ckpt/train_r3_distonly3.log 2>&1
  echo "[epilogue2] distonly 20ep fallback rc=$? at $(date)"
fi
timeout 2400 env JAX_PLATFORMS=axon python tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly \
  ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_distonly20.log 2>&1
echo "[epilogue2] distonly 20ep probe rc=$? at $(date)"

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_distonly > ckpt/test_synth_distonly20.log 2>&1
echo "[epilogue2] distonly synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_distonly \
  --feature-dir result/dvmatcher_scape_r_distonly_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_distonly_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_distonly20.log 2>&1
echo "[epilogue2] distonly synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_distonly20.log

timeout 3600 env JAX_PLATFORMS=axon python -u tools/bench_sweep.py \
  > ckpt/bench_sweep_r3.log 2>&1
echo "[epilogue2] bench sweep rc=$? at $(date)"
tail -8 ckpt/bench_sweep_r3.log
