#!/bin/bash
# Round-3 TPU measurement queue #3 — follow-ups to run_queue2.sh.
# Launch ONLY after queue 2 prints "QUEUE2 DONE" (never two TPU
# processes). Same protocol: logs /tmp/q3_<step>.log, status
# /tmp/q3_status.log, 120 s relay-recovery sleeps.
#
# Steps (edit SWEEP_UNROLL once queue 2's sweep_unroll picks a winner):
#   1. env-NEE headline A/B (VERDICT #8): cost + variance on the
#      windowed sun+sky scene, env_nee on vs off
#   2. viewer navigation preview rate (C15 interactivity evidence)
#   3. sweep-backend headline at the winning unroll
#   4. spp ladder at the winning config (spp 2 vs 4 vs 6; 8 OOMs HBM)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q3_status.log
  timeout "$to" "$@" > "/tmp/q3_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q3_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q3_status.log; exit 2; }

# 1. env NEE at headline scale (VERDICT #8): one BENCHMARKS row + a
#    data-justified default
run envnee 5400 python benchmarks/envnee.py

# 2. viewer low-res navigation preview FPS (the C15 interactive story)
run preview 3600 python benchmarks/preview_fps.py

# 3. sweep backend at the unroll-sweep winner (EDIT: set from queue 2)
run bench_sweep_u8 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SWEEP_UNROLL=8 python bench.py

# 4. spp ladder on the best backend (HBM ceiling is between 6 and 8)
run bench_spp2 2400 env BENCH_SPP=2 python bench.py
run bench_spp6 2400 env BENCH_SPP=6 python bench.py

echo "QUEUE3 DONE $(date -u)" | tee -a /tmp/q3_status.log
