#!/bin/bash
# Round-4 TPU measurement queue #11 — after the per-pixel G-buffer
# change (carry no longer hauls 10 G-buffer planes at pool width;
# ~250 MB freed at 1080p spp4):
#   1. re-baseline the headline (bounce shapes changed -> cold compile),
#   2. spp_batch=6 retry (queue 9 hit RESOURCE_EXHAUSTED; the G-buffer
#      memory was the named headroom), VERDICT r3 item 2's last lever,
#   3. the per-dispatch breakdown with the FIXED sync (1-element fetch;
#      the queue-10 run timed the axon relay shipping the 630 MB carry
#      instead of the TPU),
#   4. the beyond-parity RR row (VERDICT r3 next-step 9,
#      RenderConfig.tpu_native).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q11_status.log
  timeout "$to" "$@" > "/tmp/q11_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q11_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q11_status.log; exit 2; }

# 1. headline re-baseline on the new carry shapes (cold compile ~600 s)
run bench_gbuf 3600 python bench.py

# 2. spp_batch=6 (12.4M-lane pool; new sort shapes -> long cold compile)
run bench_spp6 5400 env BENCH_SPP=6 python bench.py

# 3. per-dispatch breakdown, fixed sync (headline shapes now warm)
run breakdown 3600 python benchmarks/sweep_breakdown.py

# 4. Russian-roulette "TPU-native mode" row (new shapes: RR changes the
#    bounce program; pool sizes unchanged -> sort programs warm)
run bench_rr 3000 env BENCH_RR=1 python bench.py

echo "QUEUE11 DONE $(date -u)" | tee -a /tmp/q11_status.log
