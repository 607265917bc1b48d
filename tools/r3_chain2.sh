#!/bin/bash
# Round-3 restart chain (the original r3_chain.sh/r3_seq3.sh queue died with
# its parent session): distonly bisect resume -> aligned probe -> WKS 20-epoch
# protocol -> aligned probe -> WKS synth full-chain eval -> partial protocol ->
# inference artifact refreshes -> headline bench.
cd /root/repo
set -u
log() { echo "[chain2] $1 at $(date)"; }

timeout 7200 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
  --config scape_r_distonly --epochs 10 --use-kernel --resume ep_2 \
  > ckpt/train_r3_distonly2.log 2>&1
log "distonly rc=$?"
timeout 2400 env JAX_PLATFORMS=axon python tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly \
  ep_1 ep_2 ep_3 ep_4 ep_5 ep_6 ep_7 ep_8 ep_9 ep_10 \
  > ckpt/probe_aligned_r3_distonly.log 2>&1
log "distonly probe rc=$?"

timeout 21600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
  --config scape_r_wks --use-kernel \
  > ckpt/train_r3_wks.log 2>&1
log "wks rc=$?"
timeout 2400 env JAX_PLATFORMS=axon python tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks \
  ep_1 ep_2 ep_3 ep_5 ep_7 ep_10 ep_13 ep_16 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wks.log 2>&1
log "wks probe rc=$?"

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_synth_wks > ckpt/test_synth_wks.log 2>&1
log "wks synth test rc=$?"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config scape_synth_wks \
  --feature-dir result/dvmatcher_scape_r_wks_scape_synth/feature \
  --corres-dir data/scape_synth/corres \
  --out result/dvmatcher_scape_r_wks_scape_synth/geodesic_error.json \
  >> ckpt/test_synth_wks.log 2>&1
log "wks synth eval rc=$?"

timeout 21600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
  --config scape_partial --use-kernel \
  > ckpt/train_r3_partial.log 2>&1
log "partial rc=$?"
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_partial > ckpt/test_r3_partial.log 2>&1
log "partial test rc=$?"

timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_wks > ckpt/test_r3_wks.log 2>&1
log "wks scape_r artifacts rc=$?"
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_nodino > ckpt/test_r3_nodino.log 2>&1
log "nodino artifact refresh rc=$?"
timeout 1800 env JAX_PLATFORMS=axon python -u bench.py > ckpt/bench_r3.log 2>&1
log "bench rc=$?"
tail -1 ckpt/bench_r3.log
