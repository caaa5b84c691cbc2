#!/bin/bash
# TPU measurement queue #18 — requires the flat-SMEM patch applied
# (benchmarks/patches_flat_smem.diff; the chaining waiter applies it).
#   1. Kernel ladder at mt128 + mt256 with FLAT SMEM ranges/boxes:
#      (a) does mt128 now compile (the 2-D SMEM row padding was the
#      1269760-byte overflow)? (b) is flat-SMEM neutral at mt256 vs the
#      queue-15 one-shot rows (236/299 ms@2M bounce1/2)? (c) does the
#      mt512->mt256 kernel win (1.6x) extend to mt128?
#   2. Shadow-cast isolation: sweep_breakdown bounce-program delta with
#      BD_NO_SHADOW=1 (cfg.debug_no_shadow) — sizes the NEE any-hit's
#      share of the fused bounce dispatch, the next attack target after
#      shade_hit.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q18_status.log
  timeout "$to" "$@" > "/tmp/q18_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q18_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q18_status.log; exit 2; }

# 1. flat-SMEM kernel ladder (mt128 compile attempt + mt256 neutrality)
run swk_flat_mt 7200 env SWK_SIZES="128 256" SWK_UNION=1 SWK_GROUPS=0 \
  SWK_TAILC=0 SWK_CASCADE=0 python benchmarks/sweep_kernel.py

# 2a/2b. shadow-cast share of the bounce program (spp4, depth 8)
run bd_base 5400 env BD_SPP=4 BD_REPS=3 python benchmarks/sweep_breakdown.py
run bd_noshadow 5400 env BD_SPP=4 BD_REPS=3 BD_NO_SHADOW=1 \
  python benchmarks/sweep_breakdown.py

echo "QUEUE18 DONE $(date -u)" | tee -a /tmp/q18_status.log
