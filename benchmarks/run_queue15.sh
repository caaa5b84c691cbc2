#!/bin/bash
# TPU measurement queue #15 — cascade sweep (cfg.sweep_cascade) A/B.
# 1. Kernel-level: sweep_kernel.py cascade rows (phase-1 / phase-2-sort /
#    phase-2 dispatch costs + the phase-1 unresolved fraction that sizes
#    the compacted prefix) on real 2M bounce populations, vs the one-shot
#    sweep8 rows from the same run.
# 2. Full-frame: BENCH_SWEEP_CASCADE=1 at spp4 (comparable to the 0.4123
#    / 0.4131 packed-seed rows), then spp6+donate (the headline shape —
#    may OOM from the extra inter-dispatch buffers; either way is a
#    finding).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q15_status.log
  timeout "$to" "$@" > "/tmp/q15_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q15_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q15_status.log; exit 2; }

# 1. kernel-level cascade vs one-shot (2M rays, mt256, union stats on)
run swk_cascade 5400 env SWK_SIZES=256 SWK_UNION=1 SWK_CASCADE=1 \
  SWK_GROUPS=0 SWK_TAILC=0 python benchmarks/sweep_kernel.py

# 2. full-frame cascade at spp4 (one new bounce-program compile class)
run bench_cascade_spp4 7200 env BENCH_SWEEP_CASCADE=1 BENCH_SPP=4 \
  python bench.py

# 3. full-frame cascade at the headline shape (spp6 + donation)
run bench_cascade_spp6 5400 env BENCH_SWEEP_CASCADE=1 BENCH_SPP=6 \
  BENCH_DONATE=1 python bench.py

# 4. cold-compile row for BENCHMARKS §6b (VERDICT r3 item 5): the 608 s
#    number predates the packed seed. A throwaway cache dir gives a true
#    cold compile without nuking the production warm cache; the bench's
#    own [bench] compile+warmup line is the measurement. spp4 packed.
run bench_cold 7200 env TPT_CACHE_DIR=/tmp/q15_cold_cache BENCH_SPP=4 \
  BENCH_FRAMES=1 python bench.py
rm -rf /tmp/q15_cold_cache

echo "QUEUE15 DONE $(date -u)" | tee -a /tmp/q15_status.log
