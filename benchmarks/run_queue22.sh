#!/bin/bash
# TPU measurement queue #22 — round 5 session 1, after queue 21.
# Order:
#   1. shadow-share diagnostic: split shade program with the light
#      any-hit dropped (BD_NO_SHADOW) — the shade_ms delta vs queue 21's
#      bd_split row is the shadow cast's share of the 870 ms shade stage
#   2. shadow rays through the sweep pipeline at the split shape
#      (BENCH_SWEEP_SHADOW retry, VERDICT r4 item 3b) — spp4 class
#   3. preview nav rows with the device-u8 fetch (+ compute/relay probe)
#   4. preview A/B with the old f32 fetch
#   5. fresh-VM simulation: empty cache dirs seeded only from the repo's
#      benchmarks/prebuilt — the exact driver scenario; all three bench
#      stages should land warm inside the default 1500 s budget
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

fails=0
runs=0
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q22_status.log
  timeout "$to" "$@" > "/tmp/q22_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q22_status.log
  runs=$((runs+1)); [ $rc -ne 0 ] && fails=$((fails+1))
  sleep 30
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 900 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q22_status.log; exit 2; }

# 1. shadow share of the shade program (compiles one new shade variant)
run bd_noshadow 2400 env BD_SPP=4 BD_SPLIT=1 BD_NO_SHADOW=1 python benchmarks/sweep_breakdown.py

# 2. sweep-path shadow rays at the split shape
run bd_sweepshadow 2400 env BD_SPP=4 BD_SPLIT=1 BENCH_SWEEP_SHADOW=1 python benchmarks/sweep_breakdown.py

# 3. preview nav point: megakernel preview, pipelined, u8 fetch, probe
run preview_u8 2400 env PF_ENGINE=mega PF_PIPELINE=1 PF_DEPTH=2 PF_SCALES="8 12" PF_PROBE=1 python benchmarks/preview_fps.py

# 4. preview A/B: f32 fetch (the round-4 configuration)
run preview_f32 1800 env PF_ENGINE=mega PF_PIPELINE=1 PF_DEPTH=2 PF_SCALES="8" PF_U8=0 python benchmarks/preview_fps.py

# 5. fresh-VM simulation (run AFTER the repo seed cache is committed):
#    empty cache dirs; prebuilt blobs + seeded XLA entries only
rm -rf /tmp/simvm_xla /tmp/simvm_scene
run freshvm_sim 1600 env TPT_CACHE_DIR=/tmp/simvm_xla TPT_SCENE_CACHE_DIR=/tmp/simvm_scene timeout 1500 python bench.py

echo "QUEUE22 DONE: $((runs-fails))/$runs rows ok $(date -u)" | tee -a /tmp/q22_status.log
[ $fails -lt $runs ] || exit 1
