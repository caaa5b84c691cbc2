#!/bin/bash
# TPU measurement queue #20 — fresh-VM session 3. Caches are cold (new
# machine): every run here both measures and pre-warms the persistent
# XLA + scene caches the driver's end-of-round bench.py will reuse.
# Order:
#   1. headline at current defaults (spp6+donate, packed seed) — this is
#      the FIRST TPU run of the one-gather shade_hit row (9e608e8) at the
#      OOM-boundary headline shape; must verify it fits HBM and whether
#      the spp4 18.24-vs-20.1 s/frame win holds at spp6 (queue-17 intent).
#   2. RR "TPU-native mode" row at the spp4/undonated class (VERDICT r3
#      item 9; cheaper compile class, lands the row even if time is short).
#   3. RR at the headline shape, only if 1+2 leave queue time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q20_status.log
  timeout "$to" "$@" > "/tmp/q20_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q20_status.log
  sleep 100
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q20_status.log; exit 2; }

# 1. headline verify + cache warm (cold class: ~300 s scene prep + ~780 s compile)
run bench_headline 3000 python bench.py
rc1=$?

# 2. RR row at the spp4 compile class (scene prep now cached)
run bench_rr_spp4 2700 env BENCH_RR=1 BENCH_SPP=4 BENCH_DONATE=0 python bench.py
rc2=$?

# 3. RR at the headline shape — only if 1+2 left queue time (i.e. landed)
if [ $rc1 -eq 0 ] && [ $rc2 -eq 0 ]; then
  run bench_rr_spp6 3000 env BENCH_RR=1 python bench.py
  rc3=$?
else
  echo "skipping bench_rr_spp6 (rc1=$rc1 rc2=$rc2)" | tee -a /tmp/q20_status.log
  rc3=1
fi

if [ $rc1 -ne 0 ] && [ $rc2 -ne 0 ] && [ $rc3 -ne 0 ]; then
  echo "QUEUE20 FAILED: every bench row nonzero $(date -u)" | tee -a /tmp/q20_status.log
  exit 1
fi
echo "QUEUE20 DONE $(date -u)" | tee -a /tmp/q20_status.log
