#!/bin/bash
# Round-3 TPU measurement queue (memory: round3-tpu-queue). Runs the
# moment the relay (port 8113) returns; sequential — NEVER two TPU
# processes at once; ~120 s recovery pause between processes.
# Logs: /tmp/q_<step>.log   Lock: /tmp/tpu_queue.running
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOCK=/tmp/tpu_queue.running
[ -e "$LOCK" ] && { echo "queue already running"; exit 1; }
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q_status.log
  timeout "$to" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q_status.log
  sleep 120   # relay recovery before the next TPU process
  return $rc
}

# 0. first contact after outage is flaky: tiny probe, retry once
run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice — relay not usable" | tee -a /tmp/q_status.log; exit 2; }

# 1. headline, measured-best known config (locks BENCH_r03 floor) —
#    also the cache-priming run for step 5
run bench_wide 5400 python bench.py

# 2. sweep8 unroll sweep + tail-compaction A/B (the decisive lever)
SWK_SIZES="512" SWK_UNROLL="4 8 16 32 64" SWK_N=2097152 SWK_UNION=1 \
  run sweep_unroll 10800 python benchmarks/sweep_kernel.py

# 3. sweep-backend headline (pool-seeded single-sort path; spp_batch 4)
run bench_sweep 5400 env BENCH_BACKEND=BVH_SWEEP python bench.py

# 4. end-to-end real-time table (BENCHMARKS §7)
run realtime 5400 python benchmarks/realtime.py

# 5. cache check: second wide-kernel bench — compile+warmup should
#    collapse vs step 1 (VERDICT #6 target < 150 s)
run bench_wide2 5400 python bench.py

# 6. sort cadence go/no-go
run bench_se2 5400 env BENCH_SORT_EVERY=2 python bench.py
run bench_se3 5400 env BENCH_SORT_EVERY=3 python bench.py

# 7. Veach MIS showcase render (radiometric-parity image)
run veach 3600 python benchmarks/render_veach.py

echo "QUEUE DONE $(date -u)" | tee -a /tmp/q_status.log
