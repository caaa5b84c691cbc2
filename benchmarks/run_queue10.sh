#!/bin/bash
# Round-4 TPU measurement queue #10 — after the packed seed landed the
# 0.4123 headline (queue 9), this queue answers:
#   1. WHERE the 20.1 s/frame goes (sweep_breakdown.py per-dispatch
#      table at the headline config) — directs the union-width attack
#      (VERDICT r3 item 2).
#   2. The interactive operating point (preview_fps.py on the v5e) —
#      VERDICT r3 item 4's "publish one real FPS tuple".
#   3. Union-width A/Bs at full frame now that the seed is one
#      scan+sort: groups+u8 (kernel +7% in round 3, end-to-end neutral
#      pre-packed-seed) and treelet_max_tris 128/512.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q10_status.log
  timeout "$to" "$@" > "/tmp/q10_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q10_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q10_status.log; exit 2; }

# 1. per-dispatch breakdown at the headline config (shapes cached from
#    queue 9's bench run -> mostly warm)
run breakdown 3000 python benchmarks/sweep_breakdown.py

# 2. interactive preview FPS (BVH_PALLAS nav engine, scales 4/6/8)
run preview 3600 env PF_SCALES="4 6 8" PF_FRAMES=30 \
  python benchmarks/preview_fps.py

# 3a. groups + unroll-8 full frame (sweep_chunk_align follows unroll)
run bench_g_u8 3000 env BENCH_SWEEP_GROUPS=1 BENCH_SWEEP_UNROLL=8 \
  python bench.py

# 3b. treelet_max_tris ladder
run bench_mt128 3000 env BENCH_TREELET_MT=128 python bench.py
run bench_mt512 3000 env BENCH_TREELET_MT=512 python bench.py

echo "QUEUE10 DONE $(date -u)" | tee -a /tmp/q10_status.log
