#!/bin/bash
# TPU measurement queue #17 — round-4 session-2 levers:
#   1. Pipelined preview A/B (Renderer.pipeline, commit 45da416) at the
#      published nav operating point (240x135 depth-2 megakernel): does
#      hiding the relay round-trip move the 6.2 FPS floor?
#   2. shade_hit one-gather hit row (de-normalized [T,40]) full-frame
#      A/B at spp4 vs the 0.4123/0.4131 five-gather rows. New compile
#      class (every bounce program changes) — spp4/undonated is the
#      ~600 s cold class.
#   3. If spp4 confirms, the spp6+donate headline re-measure vs 0.4427.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q17_status.log
  timeout "$to" "$@" > "/tmp/q17_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q17_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q17_status.log; exit 2; }

# 1a/1b. preview nav frame, unpipelined vs pipelined (fast compiles)
run preview_base 3600 env PF_ENGINE=mega PF_DEPTH=2 PF_SCALES=8 \
  PF_FRAMES=40 python benchmarks/preview_fps.py
run preview_pip 3600 env PF_ENGINE=mega PF_DEPTH=2 PF_SCALES=8 \
  PF_FRAMES=40 PF_PIPELINE=1 python benchmarks/preview_fps.py

# 2. shade_hit row at the spp4 compile class (vs 0.4123/0.4131)
run bench_shadehit_spp4 7200 env BENCH_SPP=4 BENCH_DONATE=0 python bench.py

# 3. the headline shape re-measure (vs 0.4427)
run bench_shadehit_spp6 10800 python bench.py

echo "QUEUE17 DONE $(date -u)" | tee -a /tmp/q17_status.log
