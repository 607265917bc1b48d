#!/bin/bash
# Round-3 final TPU sequence: wait for the wks probe (end of r3_chain.sh),
# then run the partial protocol, refresh SCAPE_r inference artifacts with
# the final models, and re-run the headline bench.
cd /root/repo
while ! grep -q "wks probe done" ckpt/r3_chain.log 2>/dev/null; do sleep 60; done
echo "[seq3] wks probe done detected at $(date)"

JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
  --config scape_partial --use-kernel \
  > ckpt/train_r3_partial.log 2>&1 &
P=$!; echo $P > /tmp/train.pid
echo "[seq3] partial protocol launched pid $P"
wait $P
echo "[seq3] partial protocol finished rc=$? at $(date)"

JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test --config scape_r_nodino \
  > ckpt/test_r3_nodino.log 2>&1
echo "[seq3] nodino artifact refresh rc=$? at $(date)"
JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test --config scape_r_wks \
  > ckpt/test_r3_wks.log 2>&1
echo "[seq3] wks artifact run rc=$? at $(date)"
JAX_PLATFORMS=axon python -u bench.py > ckpt/bench_r3.log 2>&1
echo "[seq3] bench rc=$? at $(date)"
tail -1 ckpt/bench_r3.log
