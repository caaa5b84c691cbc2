#!/bin/bash
# Round-3 TPU measurement queue #7 — validate the three-dispatch sweep
# full-frame (scan / sort / cast+shade as SEPARATE jit programs,
# wavefront._sweep_scan_keys + _sweep_bin_sort): the fused and the
# two-dispatch flavors both hung the TPU backend compiler >60 min at
# 8.3M lanes (queues 2/4/5). If this compiles, the sweep pipeline's
# 2.8-3.7x bounce-ray win (BENCHMARKS §4d) reaches the headline.
# Protocol: logs /tmp/q7_<step>.log, status /tmp/q7_status.log, 120 s
# relay-recovery sleeps, every step under timeout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q7_status.log
  timeout "$to" "$@" > "/tmp/q7_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q7_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q7_status.log; exit 2; }

# The one decisive step: full-frame sweep bench, spp_batch=4 headline
# config. 40 min cap — the component programs each compiled in ~1-5 min
# in benchmarks/sweep_kernel.py, so a hang past 40 min = still broken.
run bench_sweep3d 2400 env BENCH_BACKEND=bvh_sweep BENCH_SPP=4 \
  JAX_LOG_COMPILES=1 python bench.py

echo "QUEUE7 DONE $(date -u)" | tee -a /tmp/q7_status.log
