#!/bin/bash
# Round-4 TPU measurement queue #9 — the packed sweep seed (VERDICT r3
# item 1): ONE dense scan + ONE ~24-operand pool sort per bounce
# (candidate planes compressed via sweepcast.pack_seed) vs round 3's
# lean shape (20-operand sort + a SECOND dense scan). The compiler-shape
# rule (BENCHMARKS §4d) says 20 operands ~6 min, 31 never — 24 is the
# bisect point this queue answers on real hardware.
#
# Steps:
#   1. packed headline (BENCH_SWEEP_SEED=packed, spp=4) — the round-4
#      candidate headline; target >= 0.5 Mpaths/s
#   2. fallback: if packed times out / fails, re-run lean to confirm the
#      round-3 headline still stands on the current tree
#   3. spp ladder: packed at spp=6 (VERDICT item 2; 8 OOMs HBM, 6 may
#      fit — richer pools shrink the sweep kernel's block unions)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q9_status.log
  timeout "$to" "$@" > "/tmp/q9_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q9_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q9_status.log; exit 2; }

# 50-min cap: the 20-op sort alone took 344 s; allow the 24-op shape up
# to ~35 min of compile + warmup + frames before calling it pathological.
run bench_packed 3000 env BENCH_SWEEP_SEED=packed JAX_LOG_COMPILES=1 \
  python bench.py
rc_packed=$?

if [ $rc_packed -ne 0 ]; then
  echo "packed failed (rc=$rc_packed) — lean fallback" | tee -a /tmp/q9_status.log
  run bench_lean 2400 env BENCH_SWEEP_SEED=lean python bench.py
else
  # spp=6: new pool size -> full recompile; generous cap
  run bench_packed_spp6 3600 env BENCH_SWEEP_SEED=packed BENCH_SPP=6 \
    JAX_LOG_COMPILES=1 python bench.py
fi

echo "QUEUE9 DONE $(date -u)" | tee -a /tmp/q9_status.log
