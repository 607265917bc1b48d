#!/bin/bash
# Round-3 sequencer: wait for the 20-epoch nodino resume (PID $1), probe
# the new checkpoints on the aligned-GT benchmark, then start the
# dist-only bisect run.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "[seq] training PID $1 exited at $(date)"
JAX_PLATFORMS=axon python tools/probe_aligned.py --exp ckpt/dvmatcher_scape_r_nodino \
  ep_11 ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_ep11_20.log 2>&1
echo "[seq] aligned probe done at $(date)"
JAX_PLATFORMS=axon nohup python -u -m dvmatcher_tpu.cli.train \
  --config scape_r_distonly --epochs 10 --use-kernel \
  > ckpt/train_r3_distonly.log 2>&1 &
echo $! > /tmp/train.pid
echo "[seq] distonly bisect launched pid $(cat /tmp/train.pid)"
