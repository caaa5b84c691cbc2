#!/bin/bash
# Round-4 CPU-mesh validation of the multi-chip sweep path (VERDICT r3
# item 3): the new BVH_SWEEP sharded-split bit test, the packed-seed
# wavefront equality suite, and the dryrun_multichip entry (now on the
# headline backend). Runs on the 8-device virtual CPU mesh (conftest) —
# safe to run concurrently with a TPU queue.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_partest.log
{
  echo "=== sweep sharded bit test start $(date -u +%H:%M:%S) ==="
  timeout 7200 python -m pytest \
    "tests/test_parallel.py::TestSharding::test_sweep_sharded_split_bitwise" \
    -x -q
  echo "=== rc=$? $(date -u +%H:%M:%S) ==="
  echo "=== wavefront suite start $(date -u +%H:%M:%S) ==="
  timeout 7200 python -m pytest tests/test_wavefront.py -x -q
  echo "=== rc=$? $(date -u +%H:%M:%S) ==="
  echo "=== dryrun_multichip(8) start $(date -u +%H:%M:%S) ==="
  timeout 7200 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
  echo "=== rc=$? $(date -u +%H:%M:%S) ==="
  echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
} >> "$LOG" 2>&1
