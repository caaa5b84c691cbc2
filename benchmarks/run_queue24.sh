#!/bin/bash
# TPU measurement queue #24 — round 5, after queue 23.
# The §1b stage table makes the extension cast 47% of the frame; the
# unroll-8 sweep kernel measured ~15% faster than u4 in isolation back
# when the frame was dominated by the seed + 5-gather shade (queue 10:
# end-to-end neutral THEN). Retry it at the current shape where the
# cast finally is the critical path. u8 needs sweep_chunk_align=8
# tables (bench builds them; ~300 s one-off into the scene cache).
#   1. spp4/undonated u8 A/B (vs 0.4567 u4 measured today)
#   2. if 1 looks good, the headline shape with u8
#   3. u8 + group culling variant (groups trim chunk trips; the group
#      table build adds ~82 s prep)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

fails=0
runs=0
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q24_status.log
  timeout "$to" "$@" > "/tmp/q24_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q24_status.log
  runs=$((runs+1)); [ $rc -ne 0 ] && fails=$((fails+1))
  sleep 30
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 900 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q24_status.log; exit 2; }

# 1. u8 kernel at the spp4 class (align-8 table build + new kernel compile)
run bench_u8_spp4 2700 env BENCH_SWEEP_UNROLL=8 BENCH_SPP=4 BENCH_DONATE=0 BENCH_BUDGET_S=2650 python bench.py
rc1=$?

# 2. u8 at the headline shape (only if 1 landed)
if [ $rc1 -eq 0 ]; then
  run bench_u8_spp6 2700 env BENCH_SWEEP_UNROLL=8 BENCH_SPP=6 BENCH_DONATE=1 BENCH_BUDGET_S=2650 python bench.py
fi

# 3. u8 + groups at the spp4 class
run bench_u8g_spp4 2700 env BENCH_SWEEP_UNROLL=8 BENCH_SWEEP_GROUPS=1 BENCH_SPP=4 BENCH_DONATE=0 BENCH_BUDGET_S=2650 python bench.py

echo "QUEUE24 DONE: $((runs-fails))/$runs rows ok $(date -u)" | tee -a /tmp/q24_status.log
[ $fails -lt $runs ] || exit 1
