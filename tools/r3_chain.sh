#!/bin/bash
# Round-3 TPU queue: $1 = pid of the running nodino resume.
# nodino done -> probe ep_11..20 -> distonly 10ep -> probe -> wks 20ep.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "[chain] nodino finished at $(date)"
JAX_PLATFORMS=axon python tools/probe_aligned.py --exp ckpt/dvmatcher_scape_r_nodino \
  ep_11 ep_12 ep_14 ep_16 ep_18 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_ep11_20.log 2>&1
echo "[chain] nodino probe done at $(date)"

JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
  --config scape_r_distonly --epochs 10 --use-kernel \
  > ckpt/train_r3_distonly.log 2>&1 &
P2=$!; echo $P2 > /tmp/train.pid
echo "[chain] distonly launched pid $P2"
wait $P2
echo "[chain] distonly finished at $(date)"
JAX_PLATFORMS=axon python tools/probe_aligned.py --exp ckpt/dvmatcher_scape_r_distonly \
  ep_1 ep_2 ep_3 ep_4 ep_5 ep_6 ep_7 ep_8 ep_9 ep_10 \
  > ckpt/probe_aligned_r3_distonly.log 2>&1
echo "[chain] distonly probe done at $(date)"

JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.train \
  --config scape_r_wks --use-kernel \
  > ckpt/train_r3_wks.log 2>&1 &
P3=$!; echo $P3 > /tmp/train.pid
echo "[chain] wks protocol run launched pid $P3"
wait $P3
echo "[chain] wks finished at $(date)"
JAX_PLATFORMS=axon python tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks \
  ep_1 ep_2 ep_3 ep_5 ep_7 ep_10 ep_13 ep_16 ep_20 ep_val_best \
  > ckpt/probe_aligned_r3_wks.log 2>&1
echo "[chain] wks probe done at $(date)"
