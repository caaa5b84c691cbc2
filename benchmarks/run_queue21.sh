#!/bin/bash
# TPU measurement queue #21 — round 5 session 1 (VERDICT r4 items 2/3/4).
# Order (cheap compile classes first; every run also pre-warms the
# persistent caches for the later ones):
#   1. per-stage breakdown at spp4, fused shape (baseline rows; also
#      warms the spp4/undonated class bench stage 3 uses)
#   2. breakdown with BD_SPLIT=1 — the cast/shade per-stage table
#   3. breakdown with BD_SPLIT=1 BD_PRIMARY=1 — bounce-0 sweep rows
#   4. RR row at the spp4/undonated class, adaptive ladder OFF (the
#      compile-explosion fix; 4th attempt at this row across rounds)
#   5. A/B: headline shape (spp6+donate) with split_shade=1
#   6. A/B: headline shape with sweep_primary=1 (if 3 looked good)
# Each bench row exits nonzero on failure; the queue records rc values
# and exits nonzero if every row failed (ADVICE r4 on queue 20).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

fails=0
runs=0
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q21_status.log
  timeout "$to" "$@" > "/tmp/q21_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q21_status.log
  runs=$((runs+1)); [ $rc -ne 0 ] && fails=$((fails+1))
  sleep 30
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q21_status.log; exit 2; }

# 1. fused per-stage baseline (spp4; compile ~600 s cold for this class)
run bd_fused 2400 env BD_SPP=4 python benchmarks/sweep_breakdown.py

# 2. split cast/shade breakdown (same class + 2 new programs)
run bd_split 2400 env BD_SPP=4 BD_SPLIT=1 python benchmarks/sweep_breakdown.py

# 3. sweep primaries breakdown
run bd_primary 2400 env BD_SPP=4 BD_SPLIT=1 BD_PRIMARY=1 python benchmarks/sweep_breakdown.py

# 4. RR row, spp4/undonated, adaptive ladder off (BENCH_RR default)
run bench_rr_spp4 2700 env BENCH_RR=1 BENCH_SPP=4 BENCH_DONATE=0 BENCH_BUDGET_S=2650 python bench.py

# 5. headline shape + split_shade A/B
run bench_split6 2400 env BENCH_SPLIT_SHADE=1 BENCH_SPP=6 BENCH_BUDGET_S=2350 python bench.py

# 6. headline shape + sweep primaries A/B
run bench_prim6 2400 env BENCH_SWEEP_PRIMARY=1 BENCH_SPP=6 BENCH_BUDGET_S=2350 python bench.py

echo "QUEUE21 DONE: $((runs-fails))/$runs rows ok $(date -u)" | tee -a /tmp/q21_status.log
[ $fails -lt $runs ] || exit 1
