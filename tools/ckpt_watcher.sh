#!/bin/bash
# Commit the latest orbax epoch checkpoint of in-flight protocol runs so an
# environment reset can never again restart a 20-epoch TPU run from scratch
# (round 3 lost the WKS protocol three times this way: ep_* dirs lived only
# on the ephemeral disk while metrics.jsonl was committed).  Shares the git
# lock with tools/r7_chain.sh's curve watcher so commits cannot race.
#
# Growth bound: only the newest ep_N per experiment is committed, and only
# when N advanced by >= $STRIDE since the last committed epoch (plus ep_20 /
# ep_val_best always).  History accumulates ~size/STRIDE per protocol, which
# at the measured checkpoint size keeps the round's git growth modest.
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
STRIDE=${STRIDE:-3}
EXPS="ckpt/dvmatcher_scape_r_wks ckpt/dvmatcher_scape_partial_tpu ckpt/dvmatcher_scape_r_wksdist"

declare -A LAST
latest_ep() { ls -d "$1"/ep_[0-9]* 2>/dev/null | sed 's/.*ep_//' | sort -n | tail -1; }

commit_ckpt() {  # $1 exp dir, $2 epoch tag
  flock "$GITLOCK" bash -c '
    d="$1"; tag="$2"
    # orbax writes a tmp dir then renames; only commit finalized checkpoints
    [ -d "$d/$tag" ] || exit 0
    ls "$d/$tag" | grep -q tmp && exit 0
    git add -f "$d/$tag" "$d/metrics.jsonl" 2>/dev/null
    [ -d "$d/ep_val_best" ] && ! ls "$d/ep_val_best" | grep -q tmp \
      && git add -f "$d/ep_val_best" 2>/dev/null
    if ! git diff --cached --quiet; then
      git commit -q -m "Resumable checkpoint: $(basename "$d") $tag" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[ckptw] committed $d/$tag"
    else
      git reset -q >/dev/null 2>&1
    fi
  ' _ "$1" "$2"
}

FEATS_DONE=0
commit_feat_cache() {  # once WKS training has produced ep_1 the cache is complete
  flock "$GITLOCK" bash -c '
    git add -f data/cache/scape_r_wks/*.feat.npy \
      data/cache/scape_synth_wks/*.feat.npy 2>/dev/null
    if ! git diff --cached --quiet; then
      git commit -q -m "Commit WKS anchor feature caches (eigensolve output, ~20 min/reset to rebuild)" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[ckptw] committed WKS feature caches"
    else
      git reset -q >/dev/null 2>&1
    fi
  '
}

while true; do
  if [ "$FEATS_DONE" = 0 ] && [ -d ckpt/dvmatcher_scape_r_wks/ep_1 ]; then
    commit_feat_cache && FEATS_DONE=1
  fi
  for d in $EXPS; do
    ep=$(latest_ep "$d")
    [ -z "$ep" ] && continue
    last=${LAST[$d]:-0}
    if [ "$ep" -ge $((last + STRIDE)) ] || { [ "$ep" -ge 20 ] && [ "$ep" -gt "$last" ]; }; then
      commit_ckpt "$d" "ep_$ep"
      LAST[$d]=$ep
    fi
  done
  sleep 300
done
