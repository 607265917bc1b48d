#!/bin/bash
# Round-3 followup #2: after the combo chain releases the TPU, measure
# the mixed-precision (bf16) mode's quality + throughput so the bench
# default can flip on evidence, refresh the combo's SCAPE_r artifacts,
# and run the full test suite on the CPU mesh as end-of-round evidence.
cd /root/repo
echo "[followup2] start at $(date)"

F1_PID=$(cat /tmp/r4_followup.pid 2>/dev/null)
while [ -n "$F1_PID" ] && kill -0 "$F1_PID" 2>/dev/null; do
  sleep 60
done
echo "[followup2] followup #1 done at $(date)"

# ---- 1. bf16 quality gate: aligned-GT probe, best model, both precisions
timeout 2400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py \
  --exp ckpt/dvmatcher_scape_r_distonly ep_20 \
  > ckpt/probe_bf16_gate.log 2>&1
echo "[followup2] f32 probe rc=$? at $(date)"
timeout 2400 env JAX_PLATFORMS=axon python -u tools/probe_aligned.py --bf16 \
  --exp ckpt/dvmatcher_scape_r_distonly ep_20 \
  >> ckpt/probe_bf16_gate.log 2>&1
echo "[followup2] bf16 probe rc=$? at $(date)"
grep -v WARNING ckpt/probe_bf16_gate.log | grep -E "ep_|baseline" | tail -8

# ---- 2. bf16 throughput: bench + breakdown at both precisions
timeout 1800 env JAX_PLATFORMS=axon DVM_BENCH_DTYPE=bf16 python -u bench.py \
  > ckpt/bench_bf16.log 2>&1
echo "[followup2] bf16 bench rc=$? at $(date)"
tail -1 ckpt/bench_bf16.log
timeout 1800 env JAX_PLATFORMS=axon DVM_BENCH_DTYPE=bf16 python -u \
  tools/bench_breakdown.py > ckpt/bench_breakdown_bf16.log 2>&1
echo "[followup2] bf16 breakdown rc=$? at $(date)"
grep -v WARNING ckpt/bench_breakdown_bf16.log | tail -5

# ---- 3. combo SCAPE_r protocol artifacts
timeout 3600 env JAX_PLATFORMS=axon python -u -m dvmatcher_tpu.cli.test \
  --config scape_r_wksdist > ckpt/test_r3_wksdist.log 2>&1
echo "[followup2] wksdist scape_r artifacts rc=$? at $(date)"

# ---- 4. full test suite on the virtual CPU mesh (end-of-round evidence)
timeout 3600 env JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -x -q -m "not slow" > ckpt/pytest_r3.log 2>&1
echo "[followup2] pytest rc=$? at $(date)"
tail -2 ckpt/pytest_r3.log

echo "[followup2] ALL DONE at $(date)"
