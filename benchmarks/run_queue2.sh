#!/bin/bash
# Round-3 TPU measurement queue #2 — follow-ups to run_queue.sh.
# Launch ONLY after queue 1 prints "QUEUE DONE" (never two TPU
# processes). Same protocol: logs /tmp/q2_<step>.log, status
# /tmp/q2_status.log, 120 s relay-recovery sleeps.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q2_status.log
  timeout "$to" "$@" > "/tmp/q2_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q2_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q2_status.log; exit 2; }

# 1. sweep8 unroll sweep, now guarded per-unroll (queue-1's died on a
#    scoped-VMEM OOM at a big unroll and took the whole step down)
SWK_SIZES="512" SWK_UNROLL="4 8 16 32 64" SWK_N=2097152 SWK_UNION=1 \
  run sweep_unroll 10800 python benchmarks/sweep_kernel.py

# 2. sweep-backend headline retry, smallest pool first (queue-1's
#    spp4 run hung >60 min inside one remote compile — suspect the
#    seeded 8.3M-lane bounce program OOM-kills the compile helper).
#    spp1 = 2.1M pool; if it passes, escalate to spp4.
run bench_sweep_spp1 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SPP=1 JAX_LOG_COMPILES=1 python bench.py
run bench_sweep_spp4 2400 env BENCH_BACKEND=BVH_SWEEP JAX_LOG_COMPILES=1 python bench.py

# 3. shadow rays through the sweep pipeline: A/B at the headline config
#    (wide backend default vs sweep backend with sweep_shadow)
run bench_sweep_shadow 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SWEEP_SHADOW=1 python bench.py

# 4. real-time frame with the spp pool batched (one frame-fn call per
#    displayed frame; queue-1's realtime measured the sequential flavor)
run realtime_batched 5400 env RT_SCENES=143k python benchmarks/realtime.py

echo "QUEUE2 DONE $(date -u)" | tee -a /tmp/q2_status.log
