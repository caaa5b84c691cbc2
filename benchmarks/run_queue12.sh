#!/bin/bash
# Round-4 TPU measurement queue #12 — the interactive operating point,
# second attempt (queue 10 found the preview frame floor is DISPATCH
# COUNT, not ray work: 610 -> 341 ms for 4x fewer pixels). The megakernel
# engine runs the whole preview frame as ONE fused dispatch
# (make_preview_renderer mode=MEGAKERNEL), so this queue A/Bs it against
# the wavefront nav engine, then adds a depth-2 ladder at the winner.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
touch /tmp/tpu_queue.running
trap 'rm -f /tmp/tpu_queue.running' EXIT

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/q12_status.log
  timeout "$to" "$@" > "/tmp/q12_${name}.log" 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/q12_status.log
  sleep 120
  return $rc
}

run probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || run probe2 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones(8).sum()))" \
  || { echo "probe failed twice" | tee -a /tmp/q12_status.log; exit 2; }

# 1. megakernel preview engine at the queue-10 scales (d3, same scene)
run preview_mega 3600 env PF_ENGINE=mega PF_SCALES="4 6 8" PF_FRAMES=30 \
  python benchmarks/preview_fps.py

# 2. depth-2 ladder on the megakernel preview (the viewer's nav depth is
#    a quality knob; d2 halves the per-frame ray work)
run preview_mega_d2 3600 env PF_ENGINE=mega PF_DEPTH=2 PF_SCALES="2 4 8" \
  PF_FRAMES=30 python benchmarks/preview_fps.py

echo "QUEUE12 DONE $(date -u)" | tee -a /tmp/q12_status.log
