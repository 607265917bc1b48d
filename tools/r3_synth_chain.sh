#!/bin/bash
# Full protocol chain on the synthesized aligned-GT benchmark, on CPU
# (DVM_PLATFORM=cpu) so it can run while the TPU queue continues.
# $1 = pid of the nodino training run to wait for (needs final ep_val_best).
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
sleep 10
echo "[synth] starting cli.test at $(date)"
DVM_PLATFORM=cpu JAX_PLATFORMS=cpu python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth > ckpt/test_synth_cpu.log 2>&1
echo "[synth] cli.test rc=$? at $(date)"
DVM_PLATFORM=cpu JAX_PLATFORMS=cpu python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth \
  --feature-dir result/dvmatcher_scape_r_nodino_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_nodino_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_cpu.log 2>&1
echo "[synth] cli.evaluate rc=$? at $(date)"
tail -5 ckpt/test_synth_cpu.log
