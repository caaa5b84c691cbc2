#!/bin/bash
# Round-3 TPU measurement queue #4 — reruns queue 2's dead steps (the
# sweep-backend headline, killed twice by the fused-bounce compile hang
# that commit 34994db fixes with the split seed dispatch) plus queue 3's
# planned follow-ups. Same protocol: never two TPU processes, logs
# /tmp/q4_<step>.log, status /tmp/q4_status.log, 120 s relay-recovery
# sleeps, every step under timeout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q4_status.log
  timeout "$to" "$@" > "/tmp/q4_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q4_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q4_status.log; exit 2; }

# 1-3. sweep-backend headline at the queue-2 unroll winner (sweep8 u8;
#      u16 marginal, u32/u64 fail to compile). spp1 first (2.1M pool),
#      then spp4 (8.3M), then shadow rays through the sweep pipeline.
run bench_sweep_spp1 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SPP=1 BENCH_SWEEP_UNROLL=8 python bench.py
run bench_sweep_spp4 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SWEEP_UNROLL=8 python bench.py
run bench_sweep_shadow 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SWEEP_UNROLL=8 BENCH_SWEEP_SHADOW=1 python bench.py

# 4. two-key bin sort A/B (commit 3786e63, unmeasured on TPU)
run bench_sweep_keys3 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SWEEP_UNROLL=8 BENCH_SWEEP_KEY_SLOTS=3 python bench.py

# 5. env NEE at headline scale (VERDICT #8): one BENCHMARKS row + a
#    data-justified default
run envnee 5400 python benchmarks/envnee.py

# 6. real-time frame with the spp pool batched (queue-1's realtime
#    measured the sequential flavor)
run realtime_batched 5400 env RT_SCENES=143k python benchmarks/realtime.py

# 7. viewer low-res navigation preview FPS (the C15 interactive story)
run preview 3600 python benchmarks/preview_fps.py

echo "QUEUE4 DONE $(date -u)" | tee -a /tmp/q4_status.log
