#!/bin/bash
# Round-3 sequencer 2: wait for the distonly bisect (launched by seq1 as a
# NEW pid in /tmp/train.pid), probe it per-epoch on the aligned benchmark,
# then start the WKS-anchored full-protocol run.
cd /root/repo
OLD=22939
# wait for seq1 to swap the pid file to the distonly run
while true; do
  P=$(cat /tmp/train.pid 2>/dev/null)
  if [ -n "$P" ] && [ "$P" != "$OLD" ]; then break; fi
  sleep 30
done
echo "[seq2] distonly pid $P detected at $(date)"
while kill -0 "$P" 2>/dev/null; do sleep 30; done
echo "[seq2] distonly finished at $(date)"
JAX_PLATFORMS=axon python tools/probe_aligned.py --exp ckpt/dvmatcher_scape_r_distonly \
  ep_1 ep_2 ep_3 ep_4 ep_5 ep_6 ep_7 ep_8 ep_9 ep_10 \
  > ckpt/probe_aligned_r3_distonly.log 2>&1
echo "[seq2] distonly probe done at $(date)"
JAX_PLATFORMS=axon nohup python -u -m dvmatcher_tpu.cli.train \
  --config scape_r_wks --use-kernel \
  > ckpt/train_r3_wks.log 2>&1 &
echo $! > /tmp/train.pid
echo "[seq2] wks protocol run launched pid $(cat /tmp/train.pid)"
