#!/bin/bash
# After the main round-3 chain (tools/r3_chain2.sh) finishes, evaluate the
# dist-only model (the quality-optimal feature-free checkpoint, BASELINE.md
# round-3 bisect) through the full file-based protocol chain, refresh its
# SCAPE_r artifacts, and take its noise-robustness probe.
cd /root/repo
while ! grep -q "bench rc=" ckpt/r3_chain2.log 2>/dev/null; do sleep 60; done
echo "[epilogue] chain done at $(date)"

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_distonly > ckpt/test_synth_distonly.log 2>&1
echo "[epilogue] distonly synth test rc=$? at $(date)"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_distonly \
  --feature-dir result/dvmatcher_scape_r_distonly_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_distonly_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_distonly.log 2>&1
echo "[epilogue] distonly synth eval rc=$? at $(date)"
tail -3 ckpt/test_synth_distonly.log

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_distonly > ckpt/test_r3_distonly.log 2>&1
echo "[epilogue] distonly scape_r artifacts rc=$? at $(date)"

timeout 1800 env JAX_PLATFORMS=axon python -u tools/probe_quality.py \
  --exp ckpt/dvmatcher_scape_r_distonly ep_1 ep_5 ep_10 \
  > ckpt/probe_noise_r3_distonly.log 2>&1
echo "[epilogue] distonly noise probe rc=$? at $(date)"
