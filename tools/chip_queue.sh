#!/bin/bash
# Chip experiment queue (run when the axon tunnel recovers).
# Serialized on purpose: never time TPU work while other host work runs.
# Ordered by information value in case the tunnel window is short.
# Each step appends one line to /tmp/chip_queue.log.
set -u
LOG=/tmp/chip_queue.log
cd /root/repo
# the watcher already verified the tunnel; skip bench.py's probe subprocess
export PT_BENCH_NO_PROBE=1
echo "=== chip queue start $(date)" >> $LOG

run() {
  name=$1; to=$2; shift 2
  echo "--- $name $(date +%H:%M:%S)" >> $LOG
  # tail -12: bench prints 1-2 lines but knockout/scaling print one line
  # per variant/size — keep them all
  timeout "$to" "$@" 2>&1 | grep -v -i warning | tail -12 >> $LOG
}

# 1. sanity anchor: default bench (expect ~12.9; discard batch if off)
run default 1200 python bench.py
# 2. the W question: grouped windows make compile W-independent
run wide4_grp 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py
run wide8_grp 2400 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python bench.py
# 3. small clusters (fewer pair tests/ray) via the split table
run k32_w8_split 2400 env PT_CLUSTER_K=32 PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run k64_w4_split 2400 env PT_CLUSTER_K=64 PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
# 4. fewer grid steps / fewer launches
run tile256 1500 env PT_CLUSTER_RAY_TILE=256 python bench.py
run chunk230k 1500 python bench.py --ray-chunk 230400
# 5. integrator-floor attribution (stub images WRONG - timing only)
run rng_stub 1500 env PT_RNG_STUB=1 python bench.py
run rng_lean 1500 env PT_RNG_LEAN=1 python bench.py
run rng_fast 1500 env PT_RNG_FAST=1 python bench.py
run rng_fast_lean 1500 env PT_RNG_FAST=1 PT_RNG_LEAN=1 python bench.py
# floor decomposition: query-stub = the 76 ms integrator floor itself;
# query-stub+RNG_STUB isolates the threefry share of that floor
run floor_knockout 2400 python tools/tpu_knockout.py --variants full,query-stub
run floor_rng 1800 env PT_RNG_STUB=1 python tools/tpu_knockout.py --variants query-stub
# 6. second-tier variants
run pipe 1500 env PT_CLUSTER_PIPE=1 python bench.py
run tile256_pipe 1800 env PT_CLUSTER_RAY_TILE=256 PT_CLUSTER_PIPE=1 python bench.py
run wide2_grp 1500 env PT_CLUSTER_WIDE=2 PT_CLUSTER_GROUPED=1 python bench.py
run k128_w4_split 1800 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run wide3 2400 env PT_CLUSTER_WIDE=3 python bench.py
run k256 1500 env PT_CLUSTER_K=256 python bench.py
run chunk461k 1500 python bench.py --ray-chunk 460800
# straggler-tail direction: smaller chunks won for the pallas sweep
# (DESIGN.md "Wavefront chunk size") - check the march too
run chunk28k 1500 python bench.py --ray-chunk 28800
run chunk14k 1500 python bench.py --ray-chunk 14400
# 7. likely-winner combos (read results above before trusting defaults)
run combo_t256_w4g 2400 env PT_CLUSTER_RAY_TILE=256 PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py
run combo_c230_w4g 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py --ray-chunk 230400
# 8. prim-count scaling (sub-linearity datapoint)
run scaling 1800 python tools/bench_prim_scaling.py
# 9. streamed-table march: render overhead vs resident, then the
# beyond-VMEM sub-linearity demo (the march's headline claim at scale)
run stream_bench 1800 env PT_CLUSTER_STREAM=1 python bench.py
run scaling_stream 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --sizes 5000,20000,45000,100000,200000
# real-geometry scaling: the same bunny surface at 4^k x prim count
# (levels 2-3 exceed the resident VMEM wall -> stream); supercluster
# cull keeps the XLA cull share flat at scale
run scaling_bunny 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --bunny --sizes 0,1,2,3
run scaling_bunny_sup8 2400 env PT_CLUSTER_STREAM=1 PT_CLUSTER_SUPER=8 python tools/bench_prim_scaling.py --bunny --sizes 2,3
run super4_bench 1500 env PT_CLUSTER_SUPER=4 python bench.py
echo "=== chip queue done $(date)" >> $LOG
