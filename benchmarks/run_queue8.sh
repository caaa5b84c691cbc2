#!/bin/bash
# Round-3 TPU measurement queue #8 — the lean-sort sweep full-frame:
# queue 7 proved scan_rest compiles in 8 s but the 31-operand sort_rest
# sat in the backend compiler 13+ min (vs ~1 min for the wide backend's
# 20-operand pool sort), so this run uses cfg.sweep_lean_sort: the
# proven 20-operand sort shape + a second dense scan on the sorted pool
# to regenerate slot planes (CPU-verified bit-identical).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q8_status.log
  timeout "$to" "$@" > "/tmp/q8_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q8_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q8_status.log; exit 2; }

# 25-min cap: every component program of this flavor compiles in
# seconds-to-a-minute; anything past that = a new pathology, give up.
run bench_sweep_lean 1500 env BENCH_BACKEND=bvh_sweep BENCH_SPP=4 \
  BENCH_SWEEP_LEAN=1 JAX_LOG_COMPILES=1 python bench.py

echo "QUEUE8 DONE $(date -u)" | tee -a /tmp/q8_status.log
# appended 22:13: stack the kernel-bench winners on the lean flavor
