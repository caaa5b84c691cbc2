#!/bin/bash
# Round-4 TPU measurement queue #11 — (1) the per-dispatch breakdown of
# the 20.1 s headline frame with the FIXED sync (1-element fetch; the
# queue-10 run timed the axon relay shipping the 630 MB carry instead of
# the TPU), (2) the beyond-parity RR row (VERDICT r3 next-step 9,
# RenderConfig.tpu_native), (3) leftovers queue 10 may have skipped.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q11_status.log
  timeout "$to" "$@" > "/tmp/q11_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q11_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q11_status.log; exit 2; }

# 1. per-dispatch breakdown, fixed sync (headline shapes warm-cached)
run breakdown 3000 python benchmarks/sweep_breakdown.py

# 2. Russian-roulette "TPU-native mode" row (new shapes: RR changes the
#    bounce program; pool sizes unchanged -> sort programs warm)
run bench_rr 3000 env BENCH_RR=1 python bench.py

echo "QUEUE11 DONE $(date -u)" | tee -a /tmp/q11_status.log
