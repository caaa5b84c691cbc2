#!/bin/bash
# TPU measurement queue #23 — round 5 session 1, after queue 22.
# RR ("TPU-native mode") at richer shapes, now that the ladder-off fix
# landed the first RR row (0.6232 at spp4/undonated, queue 21):
#   1. RR at the spp6+donate headline shape (the morning's 50-min
#      timeout pre-paid part of this compile class into the cache)
#   2. RR at spp4 with the adaptive ladder ON (the rung programs were
#      partially compiled during the 45-min queue-20 burn; ladder-on is
#      the honest RR configuration — dead lanes leave the pool at n/4)
#   3. final fresh-VM-simulation bench rerun (post any seed top-up)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

fails=0
runs=0
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q23_status.log
  timeout "$to" "$@" > "/tmp/q23_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q23_status.log
  runs=$((runs+1)); [ $rc -ne 0 ] && fails=$((fails+1))
  sleep 30
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 900 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q23_status.log; exit 2; }

# 1. RR at the spp6+donate headline shape (adaptive off via BENCH_RR default)
run bench_rr_spp6 3100 env BENCH_RR=1 BENCH_SPP=6 BENCH_DONATE=1 BENCH_BUDGET_S=3050 python bench.py

# 2. RR at spp4 with the ladder ON (rung-program compile may partially hit)
run bench_rr_ladder 3100 env BENCH_RR=1 BENCH_SPP=4 BENCH_DONATE=0 BENCH_ADAPTIVE=1 BENCH_BUDGET_S=3050 python bench.py

# 3. preview nav re-run with the fused display dispatch + lazy reset
#    (engine changes landed AFTER queue 22's preview rows: the u8 path
#    there paid an extra per-frame dispatch and eager display math)
run preview_u8_v2 1800 env PF_ENGINE=mega PF_PIPELINE=1 PF_DEPTH=2 PF_SCALES="8 12" PF_PROBE=1 python benchmarks/preview_fps.py

# 4. fresh-VM simulation rerun (validates the final committed seed)
rm -rf /tmp/simvm2_xla /tmp/simvm2_scene
run freshvm_sim2 1600 env TPT_CACHE_DIR=/tmp/simvm2_xla TPT_SCENE_CACHE_DIR=/tmp/simvm2_scene timeout 1500 python bench.py

echo "QUEUE23 DONE: $((runs-fails))/$runs rows ok $(date -u)" | tee -a /tmp/q23_status.log
[ $fails -lt $runs ] || exit 1
