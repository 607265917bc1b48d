#!/bin/bash
# Stage 3: the WKS protocol run was OOM-killed at epoch 7 (host RAM creep —
# same failure mode as round-2's nodino resumes). Resume it to 20 epochs
# with auto-retry from the latest checkpoint, then probe + final eval.
cd /root/repo
# runs right after stage 1 (the WKS protocol completion outranks the
# distonly polish in stage 2 if the round clock runs out)
while ! grep -q "distonly noise probe rc=" ckpt/r3_epilogue.log 2>/dev/null; do sleep 60; done
echo "[epilogue3] stage-1 done at $(date)"

latest() {
  ls -d ckpt/dvmatcher_scape_r_wks/ep_[0-9]* 2>/dev/null \
    | sed 's/.*ep_//' | sort -n | tail -1
}

for attempt in 1 2 3 4; do
  EP=$(latest)
  if [ "$EP" -ge 20 ]; then break; fi
  NOFUSE=""
  if [ "$attempt" -ge 3 ]; then NOFUSE="DVM_NO_FUSED_FEED=1"; fi
  echo "[epilogue3] resume attempt $attempt from ep_$EP ($NOFUSE) at $(date)"
  timeout 14400 env JAX_PLATFORMS=axon $NOFUSE python -u -m dvmatcher_tpu.cli.train \
    --config scape_r_wks --use-kernel --resume "ep_$EP" \
    >> ckpt/train_r3_wks_resume.log 2>&1
  echo "[epilogue3] resume attempt $attempt rc=$? (latest now ep_$(latest))"
done

timeout 2400 env JAX_PLATFORMS=axon python tools/probe_aligned.py --wks 128 \
  --exp ckpt/dvmatcher_scape_r_wks \
  ep_8 ep_10 ep_12 ep_14 ep_16 ep_18 ep_20 \
  > ckpt/probe_aligned_r3_wks20.log 2>&1
echo "[epilogue3] wks 20ep probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_aligned_r3_wks20.log | tail -8

# final-epoch protocol eval (ep_val_best stays ep_1 by the reference's
# val-selection semantics; evaluate ep_20 separately via a tag copy)
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
  echo "[epilogue3] wks ep20 synth test rc=$? at $(date)"
  timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
    --config /tmp/scape_synth_wks_ep20.yaml \
    --feature-dir result/dvmatcher_scape_r_wks_ep20_scape_synth/feature \
    --corres-dir data/scape_synth/corres \
    --out result/dvmatcher_scape_r_wks_ep20_scape_synth/geodesic_error.json \
    >> ckpt/test_synth_wks20.log 2>&1
  echo "[epilogue3] wks ep20 synth eval rc=$? at $(date)"
  tail -3 ckpt/test_synth_wks20.log
fi
echo "[epilogue3] done at $(date)"
