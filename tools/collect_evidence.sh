#!/bin/bash
# Copy the round's key (gitignored) evidence artifacts into evidence/ so
# they are durable in git: training curves, aligned/noise probes, the
# dynamics-parity logs, and protocol geodesic-error results.
cd /root/repo
mkdir -p evidence/r3
cp -f ckpt/dynpar_ref.jsonl ckpt/dynpar_jax.jsonl evidence/r3/ 2>/dev/null
for f in ckpt/probe_aligned_r3*.log ckpt/probe_noise_r3*.log; do
  [ -f "$f" ] && grep -v WARNING "$f" > "evidence/r3/$(basename "$f")"
done
for exp in scape_r_nodino scape_r_alpha10 scape_r_distonly scape_r_wks; do
  [ -f "ckpt/dvmatcher_$exp/metrics.jsonl" ] \
    && cp -f "ckpt/dvmatcher_$exp/metrics.jsonl" "evidence/r3/metrics_$exp.jsonl"
done
[ -f ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl ] \
  && cp -f ckpt/dvmatcher_scape_partial_tpu/metrics.jsonl evidence/r3/metrics_scape_partial.jsonl
for d in result/*_scape_synth; do
  [ -f "$d/geodesic_error.json" ] \
    && cp -f "$d/geodesic_error.json" "evidence/r3/geoerr_$(basename "$d").json"
done
[ -f ckpt/bench_sweep_r3.log ] && grep -v WARNING ckpt/bench_sweep_r3.log > evidence/r3/bench_sweep.log
ls -la evidence/r3/
