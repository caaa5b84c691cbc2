#!/bin/bash
# Round-3 TPU measurement queue #6 — the never-run steps from queues
# 3/4 (their sessions died before reaching them): env-NEE headline A/B
# (VERDICT #8), the spp-batched real-time frame, and the viewer
# navigation preview rate (C15 evidence). Launch ONLY after queue 5
# prints "QUEUE5 DONE" (never two TPU processes). Same protocol:
# logs /tmp/q6_<step>.log, status /tmp/q6_status.log, 120 s
# relay-recovery sleeps, every step under timeout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q6_status.log
  timeout "$to" "$@" > "/tmp/q6_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q6_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q6_status.log; exit 2; }

# 1. env NEE at headline scale (VERDICT #8): one BENCHMARKS row + a
#    data-justified default
run envnee 5400 python benchmarks/envnee.py

# 2. real-time frame with the spp pool batched (queue-1's realtime
#    measured the sequential flavor)
run realtime_batched 5400 env RT_SCENES=143k python benchmarks/realtime.py

# 3. viewer low-res navigation preview FPS (the C15 interactive story)
run preview 3600 python benchmarks/preview_fps.py

echo "QUEUE6 DONE $(date -u)" | tee -a /tmp/q6_status.log
