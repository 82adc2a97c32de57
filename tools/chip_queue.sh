#!/bin/bash
# Chip experiment queue (run when the axon tunnel recovers).
# Serialized on purpose: never time TPU work while other host work runs.
# Each step appends one line to /tmp/chip_queue.log.
set -u
LOG=/tmp/chip_queue.log
cd /root/repo
echo "=== chip queue start $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name $(date +%H:%M:%S)" >> $LOG
  timeout 900 "$@" 2>&1 | grep -v Warning | tail -2 >> $LOG
}

# 1. sanity: default bench (expect ~12.9)
run default python bench.py
# 2. pipelined march
run pipe env PT_CLUSTER_PIPE=1 python bench.py
# 3. W=4 retry (bigger timeout than the outage-window attempt)
run wide4 env PT_CLUSTER_WIDE=4 python bench.py
# 4. ray_tile 256 (fewer grid steps per launch)
run tile256 env PT_CLUSTER_RAY_TILE=256 python bench.py
# 5. prim-count scaling (sub-linearity datapoint)
run scaling python tools/bench_prim_scaling.py
echo "=== chip queue done $(date)" >> $LOG
