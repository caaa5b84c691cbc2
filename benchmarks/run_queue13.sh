#!/bin/bash
# Round-4 TPU measurement queue #13 — buffer donation (cfg.donate_pool):
#   1. headline A/B with donation ON (value-neutral by test; measures
#      whether in-place pool aliasing also buys time),
#   2. spp_batch=6 WITH donation — queue 11's spp6 retry still hit
#      RESOURCE_EXHAUSTED after the per-pixel G-buffer shrink, so the
#      remaining peak is the double-buffered pool across dispatch
#      boundaries, which donation removes (~1.5-2 GB at 12.4M lanes).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q13_status.log
  timeout "$to" "$@" > "/tmp/q13_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q13_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q13_status.log; exit 2; }

# 1. donation headline A/B (same pool shapes; donation changes program
#    aliasing -> recompile, but sort programs cache-hit)
run bench_donate 3600 env BENCH_DONATE=1 python bench.py

# 2. spp6 with donation (the OOM lever)
run bench_spp6_donate 5400 env BENCH_SPP=6 BENCH_DONATE=1 python bench.py

echo "QUEUE13 DONE $(date -u)" | tee -a /tmp/q13_status.log
