#!/bin/bash
# Post-chain follow-up for round 3: once tools/r7_chain.sh has finished (or
# between its TPU stages), regenerate the registration .off artifacts that
# the third environment reset wiped (VERDICT r2 weak #6 asked for committed
# artifacts, not only the arap numbers in ckpt/deform_r3_distonly.log) and
# commit them.  Uses whatever trained checkpoint exists — prefers the
# WKS-anchored protocol's val_best, falls back to its latest epoch.
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock

EXP=ckpt/dvmatcher_scape_r_wks
CFG=scape_r_wks
if [ ! -d "$EXP/ep_val_best" ]; then echo "[r8] no ep_val_best yet; abort"; exit 1; fi
echo "[r8] registration artifacts from $CFG/ep_val_best"

REFPTH=/root/reference/ckpt/dvmatcher_scape_r/ep_deformer_val_best.pth
for MODE in "" "--mesh"; do
  timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.deform \
    --config "$CFG" $MODE --deformer-ref "$REFPTH" \
    >> ckpt/deform_r3_wks.log 2>&1
  echo "[r8] deform $MODE rc=$?"
done

flock "$GITLOCK" bash -c '
  # separate adds: one unmatched pathspec must not abort staging the other
  # (ADVICE r3 low) — the log is the failure evidence when deform bails
  git add -f ckpt/deform_r3_wks.log 2>/dev/null
  git add -f result/deform_dvmatcher_scape_r_wks 2>/dev/null
  if ! git diff --cached --quiet; then
    git commit -q -m "Registration artifacts (point + qslim-mesh) from the WKS-anchored checkpoint" \
      -m "No-Verification-Needed: evidence artifacts only, no source change"
    echo "[r8] committed registration artifacts"
  fi
'
