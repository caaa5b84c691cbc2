#!/bin/bash
# TPU measurement queue #16 — the RR row, attempt 3, at a compile-feasible
# shape. Queue 11 (3000 s) and queue 14 (7200 s) both died inside the cold
# compile because BENCH_RR=1 at the headline defaults (spp6 + donate)
# recompiles every bounce program at the 12.4M-lane pool shape. RR is
# elementwise (no new sort operands), so the spp4 class — whose true cold
# compile queue 15 measures separately — is the honest, feasible row:
# comparable to the 0.4123 spp4 parity row, metric name gains `_rr`.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q16_status.log
  timeout "$to" "$@" > "/tmp/q16_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q16_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q16_status.log; exit 2; }

# RR estimator row at the spp4 / undonated compile class
run bench_rr_spp4 7200 env BENCH_RR=1 BENCH_SPP=4 BENCH_DONATE=0 \
  python bench.py

echo "QUEUE16 DONE $(date -u)" | tee -a /tmp/q16_status.log
