#!/bin/bash
# Commit the latest orbax epoch checkpoint of in-flight protocol runs so an
# environment reset can never again restart a 20-epoch TPU run from scratch
# (round 3 lost the WKS protocol three times this way: ep_* dirs lived only
# on the ephemeral disk while metrics.jsonl was committed).  Shares the git
# lock with the chain scripts' curve watcher so commits cannot race.
#
# Growth bound: only the newest ep_N per experiment is committed, and only
# when N advanced by >= $STRIDE since the last committed epoch (plus ep_20 /
# ep_val_best always).  History accumulates ~size/STRIDE per protocol, which
# at the measured checkpoint size keeps the round's git growth modest.
#
# ADVICE r3 fixes: every path gets its own `git add` (git add is
# all-or-nothing per invocation — one unmatched pathspec used to silently
# stage NOTHING and the 2>/dev/null hid it); latest_ep filters out orbax
# in-flight tmp dirs; LAST[$d] only advances when commit_ckpt actually
# staged+committed (or verified already-committed) state.
cd /root/repo || exit 1
GITLOCK=/tmp/dvm_git.lock
STRIDE=${STRIDE:-3}
EXPS="ckpt/dvmatcher_scape_r_wks ckpt/dvmatcher_scape_partial_tpu ckpt/dvmatcher_scape_r_distonly ckpt/dvmatcher_scape_r_wksdist ckpt/dvmatcher_scape_r_wksfull"

declare -A LAST
latest_ep() {
  # only finalized dirs: the glob ep_[0-9]* also matches orbax tmp dirs
  # like ep_7.orbax-checkpoint-tmp-123 whose suffix breaks the -ge test
  ls -d "$1"/ep_[0-9]* 2>/dev/null | grep -E 'ep_[0-9]+$' \
    | sed 's/.*ep_//' | sort -n | tail -1
}

commit_ckpt() {  # $1 exp dir, $2 epoch tag; rc 0 = state is safely in git
  flock "$GITLOCK" bash -c '
    d="$1"; tag="$2"
    # orbax writes a tmp dir then renames; only commit finalized checkpoints
    [ -d "$d/$tag" ] || exit 1
    ls "$d/$tag" | grep -q tmp && exit 1
    git add -f "$d/$tag" || exit 1
    [ -f "$d/metrics.jsonl" ] && git add -f "$d/metrics.jsonl"
    [ -d "$d/ep_val_best" ] && ! ls "$d/ep_val_best" | grep -q tmp \
      && git add -f "$d/ep_val_best"
    if ! git diff --cached --quiet; then
      git commit -q -m "Resumable checkpoint: $(basename "$d") $tag" \
        -m "No-Verification-Needed: evidence artifacts only, no source change" \
        || exit 1
      echo "[ckptw] committed $d/$tag"
    else
      git reset -q >/dev/null 2>&1   # already committed earlier: still safe
    fi
    exit 0
  ' _ "$1" "$2"
}

FEATS_DONE=0
commit_feat_cache() {  # once WKS training has produced ep_1 the cache is complete
  # rc 0 only when BOTH cache dirs are (now or already) tracked in git
  flock "$GITLOCK" bash -c '
    shopt -s nullglob
    ok=1
    for dir in data/cache/scape_r_wks data/cache/scape_synth_wks; do
      files=("$dir"/*.feat.npy)
      if [ ${#files[@]} -eq 0 ]; then ok=0; continue; fi
      for f in "${files[@]}"; do git add -f "$f"; done
    done
    if ! git diff --cached --quiet; then
      git commit -q -m "Commit WKS anchor feature caches (eigensolve output, ~20 min/reset to rebuild)" \
        -m "No-Verification-Needed: evidence artifacts only, no source change"
      echo "[ckptw] committed WKS feature caches"
    else
      git reset -q >/dev/null 2>&1
    fi
    # done only when both dirs are fully tracked
    [ "$ok" = 1 ] \
      && [ -n "$(git ls-files data/cache/scape_r_wks | head -1)" ] \
      && [ -n "$(git ls-files data/cache/scape_synth_wks | head -1)" ]
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
      if commit_ckpt "$d" "ep_$ep"; then
        LAST[$d]=$ep
      fi
    fi
  done
  sleep 300
done
