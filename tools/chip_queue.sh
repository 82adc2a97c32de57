#!/bin/bash
# Chip experiment queue (run when the axon tunnel recovers).
# Serialized on purpose: never time TPU work while other host work runs.
# Each step appends one line to /tmp/chip_queue.log.
set -u
LOG=/tmp/chip_queue.log
cd /root/repo
echo "=== chip queue start $(date)" >> $LOG

run() {
  name=$1; to=$2; shift 2
  echo "--- $name $(date +%H:%M:%S)" >> $LOG
  timeout "$to" "$@" 2>&1 | grep -v -i warning | tail -2 >> $LOG
}

# 1. sanity: default bench (expect ~12.9; anchor — discard batch if off)
run default 1200 python bench.py
# 2. pipelined march (W=2 + software pipeline)
run pipe 1500 env PT_CLUSTER_PIPE=1 python bench.py
# 3. ray_tile 256: halves grid steps / per-op issue count per ray
run tile256 1500 env PT_CLUSTER_RAY_TILE=256 python bench.py
# 4. combo of the two
run tile256_pipe 1800 env PT_CLUSTER_RAY_TILE=256 PT_CLUSTER_PIPE=1 python bench.py
# 5. grouped window layout (one epilogue instantiation regardless of W):
#    first validate W=2 grouped == W=2 per-slot speed-wise, then push W up
run wide2_grp 1500 env PT_CLUSTER_WIDE=2 PT_CLUSTER_GROUPED=1 python bench.py
run wide4_grp 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py
run wide8_grp 2400 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python bench.py
# 6. W=3 per-slot (W=4 hit the compile wall; W=3 may fit)
run wide3 2400 env PT_CLUSTER_WIDE=3 python bench.py
# 7. K=256 clusters: more FLOPs per issue, fewer visits per ray
run k256 1500 env PT_CLUSTER_K=256 python bench.py
# 8. bigger wavefront chunks: fewer march launches (table DMA + launch
#    overhead amortize; sorted compaction already retires dead lanes)
run chunk230k 1500 python bench.py --ray-chunk 230400
run chunk461k 1500 python bench.py --ray-chunk 460800
# 9a. small clusters via split-table grouped windows: fewer pair tests
#     per ray (finer culling), window still sweeps wide*K >= 128 lanes
run k128_w4_split 1800 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run k64_w4_split 2400 env PT_CLUSTER_K=64 PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run k32_w8_split 2400 env PT_CLUSTER_K=32 PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
# 9. likely-winner combos (read results above before trusting defaults)
run combo_t256_w4g 2400 env PT_CLUSTER_RAY_TILE=256 PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py
run combo_c230_w4g 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py --ray-chunk 230400
# 10. integrator-floor attribution: how much is threefry? (stub images
#     are WRONG - timing only); then the legitimate lean-RNG option
run rng_stub 1500 env PT_RNG_STUB=1 python bench.py
run rng_lean 1500 env PT_RNG_LEAN=1 python bench.py
# 11. prim-count scaling (sub-linearity datapoint)
run scaling 1800 python tools/bench_prim_scaling.py
echo "=== chip queue done $(date)" >> $LOG
