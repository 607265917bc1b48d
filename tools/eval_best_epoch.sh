#!/bin/bash
# File-based synth protocol eval at the PROBE-BEST epoch of an experiment.
#
#   tools/eval_best_epoch.sh <probe_log> <exp_dir> <synth_config> <expname>
#
# The reference's ep_val_best selection compares val losses computed at
# DIFFERENT annealed alphas per epoch (train.py:75,135-169) — so on runs
# where the anneal inflates mid-run losses, val-best lands on an early
# epoch regardless of descriptor quality. The aligned-GT probe measures
# quality directly; this script tag-copies the probe's best epoch into a
# pseudo-experiment and runs the full cli.test -> cli.evaluate chain on it,
# committing the eval JSON.
set -u
cd /root/repo || exit 1
PROBE=$1; EXP=$2; CFG=$3; NAME=$4
GITLOCK=/tmp/dvm_git.lock

BEST=$(grep -oE "^ep_[0-9]+: aligned mean geodesic error [0-9.]+" "$PROBE" \
  | sort -t' ' -k6 -g | head -1 | cut -d: -f1)
[ -z "$BEST" ] && { echo "[bestep] no probe rows in $PROBE"; exit 1; }
ERR=$(grep "^$BEST:" "$PROBE" | grep -oE "[0-9.]+$")
echo "[bestep] probe-best $BEST (aligned err $ERR)"
[ -d "$EXP/$BEST" ] || { echo "[bestep] $EXP/$BEST missing"; exit 1; }

PSEUDO=${EXP}_best
rm -rf "$PSEUDO"; mkdir -p "$PSEUDO"
cp -r "$EXP/$BEST" "$PSEUDO/ep_val_best"
python - "$CFG" "$(basename "$PSEUDO")" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(f"dvmatcher_tpu/configs/{sys.argv[1]}.yaml"))
cfg["expname"] = sys.argv[2]
yaml.safe_dump(cfg, open(f"/tmp/{sys.argv[2]}_synth.yaml", "w"))
EOF
PCFG=/tmp/$(basename "$PSEUDO")_synth.yaml
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config "$PCFG" > "ckpt/test_synth_${NAME}_best.log" 2>&1
echo "[bestep] test rc=$?"
RES="result/$(basename "$PSEUDO")_scape_synth"
timeout 1800 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.evaluate \
  --config "$PCFG" --feature-dir "$RES/feature" \
  --corres-dir data/scape_synth/corres \
  --out "$RES/geodesic_error.json" >> "ckpt/test_synth_${NAME}_best.log" 2>&1
echo "[bestep] eval rc=$?"
tail -2 "ckpt/test_synth_${NAME}_best.log"

flock "$GITLOCK" bash -c '
  git add -f "$1" 2>/dev/null; git add -f "$2" 2>/dev/null
  if ! git diff --cached --quiet; then
    git commit -q -m "Synth protocol eval at probe-best epoch ($3 $4)" \
      -m "No-Verification-Needed: evidence artifacts only, no source change"
    echo "[bestep] committed"
  fi
' _ "$RES/geodesic_error.json" "ckpt/test_synth_${NAME}_best.log" "$NAME" "$BEST"
