#!/bin/bash
# Round-3 TPU measurement queue #5 — retries queue 4's dead steps with
# the 3-dispatch sweep seed split (scan_rest / sort_rest / bounce_rest:
# the 2-dispatch split of commit 34994db still hung the TPU compiler on
# jit(seed_rest), observed 14:58 2026-08-18). Adds the group-culling
# kernel A/B (sweep8g, commit b27cce9 — queue 2 ran before it landed).
# Same protocol: never two TPU processes, logs /tmp/q5_<step>.log,
# status /tmp/q5_status.log, 120 s relay-recovery sleeps, every step
# under timeout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q5_status.log
  timeout "$to" "$@" > "/tmp/q5_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q5_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q5_status.log; exit 2; }

# 1. THE compile test: sweep-backend full frame at spp1 with the
#    3-dispatch seed split. If this times out at 3600 the split is
#    still not enough — check the last jit(...) line in the log.
run bench_sweep_spp1 3600 env JAX_LOG_COMPILES=1 BENCH_BACKEND=BVH_SWEEP BENCH_SPP=1 BENCH_SWEEP_UNROLL=8 python bench.py

# 2. group-culling kernel A/B on real bounce rays (sweep8 vs sweep8g
#    per unroll; SWK_GROUPS defaults on)
run sweep_groups 3600 env SWK_N=2097152 SWK_SIZES=512 SWK_UNROLL="4 8 16" SWK_GROUPS=1 SWK_TAILC=0 python benchmarks/sweep_kernel.py

# 3. sweep-backend headline at spp4 (8.3M-lane pool)
run bench_sweep_spp4 3600 env BENCH_BACKEND=BVH_SWEEP BENCH_SWEEP_UNROLL=8 python bench.py

# 4. spp1 with group culling (full-frame A/B vs step 1)
run bench_sweep_spp1_groups 2400 env BENCH_BACKEND=BVH_SWEEP BENCH_SPP=1 BENCH_SWEEP_UNROLL=8 BENCH_SWEEP_GROUPS=1 python bench.py

echo "QUEUE5 DONE $(date -u)" | tee -a /tmp/q5_status.log
