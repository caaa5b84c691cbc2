#!/bin/bash
# TPU measurement queue #19 — the RR "TPU-native mode" row (VERDICT r3
# item 9, still unmeasured: q11 hit the spp6-donated cold-compile class
# and timed out; q16's spp4 attempt was killed 4 min in by session end).
# Strategy: measure at the spp4/undonated compile class first (~600 s
# cold ceiling, well inside the timeout), then — only if spp4 lands —
# the spp6+donate headline shape. RR changes every bounce program
# (new compile class), so both runs pay cold compile for the bounce set.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q19_status.log
  timeout "$to" "$@" > "/tmp/q19_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q19_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q19_status.log; exit 2; }

# 1. RR row at the spp4 compile class
run bench_rr_spp4 10800 env BENCH_RR=1 BENCH_SPP=4 BENCH_DONATE=0 python bench.py \
  && \
# 2. RR at the headline shape (spp6 + donate) — only if spp4 landed
run bench_rr_spp6 14400 env BENCH_RR=1 python bench.py

echo "QUEUE19 DONE $(date -u)" | tee -a /tmp/q19_status.log
