#!/bin/bash
# TPU measurement queue #14 — the two rows round 4 left unmeasured
# (written end of round 4; NOT run in-round — the driver's end-of-round
# bench.py owns the TPU slot. Launch this first thing in round 5):
#   1. BENCH_RR=1 — the beyond-parity "TPU-native mode" estimator row
#      (RenderConfig.tpu_native, RR from bounce 3). Queue 11's attempt
#      died at a 3000 s timeout still inside the cold compile: RR
#      changes EVERY bounce program, so nothing cache-hits. Budget 2 h.
#   2. BENCH_SPP=8 donated — BENCHMARKS §1 calls spp=8 "untried
#      (expected to OOM)"; settle it with a measurement either way.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q14_status.log
  timeout "$to" "$@" > "/tmp/q14_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q14_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q14_status.log; exit 2; }

# 1. RR row: spp/donate at the headline defaults, 2 h budget for the
#    uncached bounce-program compiles (persistent cache then holds them)
run bench_rr 7200 env BENCH_RR=1 python bench.py

# 2. spp=8 donated probe (either a row or a confirmed OOM for §1)
run bench_spp8_donate 2400 env BENCH_SPP=8 python bench.py

echo "QUEUE14 DONE $(date -u)" | tee -a /tmp/q14_status.log
