#!/bin/bash
# Chip experiment queue (run when the axon tunnel recovers).
# Serialized on purpose: never time TPU work while other host work runs.
# Ordered by information value in case the tunnel window is short:
# tier A = round-3 deliverables (march wins, floor attribution,
# sub-linearity demo), tier B = remaining sweeps/combos.
# Every kernel variant here passed tools/tpu_lowering_check.py on CPU.
set -u
LOG=/tmp/chip_queue.log
cd /root/repo
# the watcher already verified the tunnel; skip bench.py's probe subprocess
export PT_BENCH_NO_PROBE=1
echo "=== chip queue start $(date)" >> $LOG

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert "cpu" not in str(d[0]).lower(), d
x = jnp.ones((8, 128))
(x @ x.T).sum().block_until_ready()
EOF
}

run() {
  name=$1; to=$2; shift 2
  # mid-queue outage guard: if the tunnel died between entries, wait for
  # it (up to ~1 h) instead of burning every remaining entry on timeouts
  for i in $(seq 1 12); do
    probe && break
    echo "... tunnel lost before $name, probe $i failed $(date +%H:%M:%S)" >> $LOG
    sleep 120
  done
  echo "--- $name $(date +%H:%M:%S)" >> $LOG
  # tail -12: bench prints 1-2 lines but knockout/scaling print one line
  # per variant/size — keep them all
  timeout "$to" "$@" 2>&1 | grep -v -i warning | tail -12 >> $LOG
}

### tier A — round-3 deliverables first

# A1. sanity anchor: default bench (expect ~12.9; discard batch if off)
run default 1200 python bench.py
# A2. the W question: grouped windows make compile W-independent
run wide4_grp 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py
run wide8_grp 2400 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python bench.py
# A3. integrator-floor attribution + best legitimate fix
#     (rng_stub images WRONG - timing only)
run rng_stub 1500 env PT_RNG_STUB=1 python bench.py
run rng_fast_lean 1500 env PT_RNG_FAST=1 PT_RNG_LEAN=1 python bench.py
# A4. sub-linearity at scale, real geometry (levels 2-3 beyond the
#     resident VMEM wall -> streamed march)
run scaling_bunny 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --bunny --sizes 0,1,2,3
# A5. small clusters (fewer pair tests/ray) via the split table
run k32_w8_split 2400 env PT_CLUSTER_K=32 PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run k64_w4_split 2400 env PT_CLUSTER_K=64 PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
# A6. fewer grid steps / fewer launches
run tile256 1500 env PT_CLUSTER_RAY_TILE=256 python bench.py
run chunk230k 1500 python bench.py --ray-chunk 230400
# A7. floor decomposition: query-stub = the 76 ms integrator floor
#     itself; query-stub+RNG_STUB isolates the threefry share of it
run floor_knockout 2400 python tools/tpu_knockout.py --variants full,query-stub
run floor_rng 1800 env PT_RNG_STUB=1 python tools/tpu_knockout.py --variants query-stub
# A8. streamed-table march: render overhead vs resident + cloud scaling
run stream_bench 1800 env PT_CLUSTER_STREAM=1 python bench.py
run scaling_stream 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --sizes 5000,20000,45000,100000,200000

### tier B — remaining sweeps and combos

# B1. rng singles (decompose the fast_lean combo if it wins)
run rng_lean 1500 env PT_RNG_LEAN=1 python bench.py
run rng_fast 1500 env PT_RNG_FAST=1 python bench.py
# sort-once: camera-bounce binning only (saves ~3/4 of re-bin sorts
# against bounce-wavefront locality — exact, see test_sort_once_mode)
run sort_once 1500 env PT_SORT_ONCE=1 python bench.py
# B2. second-tier march variants
run pipe 1500 env PT_CLUSTER_PIPE=1 python bench.py
run tile256_pipe 1800 env PT_CLUSTER_RAY_TILE=256 PT_CLUSTER_PIPE=1 python bench.py
run wide2_grp 1500 env PT_CLUSTER_WIDE=2 PT_CLUSTER_GROUPED=1 python bench.py
run k128_w4_split 1800 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run wide3 2400 env PT_CLUSTER_WIDE=3 python bench.py
run wide16_grp 2400 env PT_CLUSTER_WIDE=16 PT_CLUSTER_GROUPED=1 python bench.py
run k256 1500 env PT_CLUSTER_K=256 python bench.py
run chunk461k 1500 python bench.py --ray-chunk 460800
# straggler-tail direction: smaller chunks won for the pallas sweep
# (DESIGN.md "Wavefront chunk size") - check the march too
run chunk28k 1500 python bench.py --ray-chunk 28800
run chunk14k 1500 python bench.py --ray-chunk 14400
# B3. likely-winner combos (read results above before trusting defaults)
run combo_t256_w4g 2400 env PT_CLUSTER_RAY_TILE=256 PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py
run combo_c230_w4g 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py --ray-chunk 230400
# stream moves the (n_chunks x C_reg) ids/ents tables out of SMEM — a
# candidate fix for the 230k-chunk >30min compile wall (DESIGN.md)
run combo_c230_stream 2400 env PT_CLUSTER_STREAM=1 python bench.py --ray-chunk 230400
# B4. synthetic-cloud scaling (resident, reference point for A4/A8)
run scaling 1800 python tools/bench_prim_scaling.py
# cross-scene cluster-vs-tensor (the default-flip evidence, VERDICT #4)
run cornell_cluster 1500 python bench.py --scene cornell
run cornell_tensor 1500 python bench.py --scene cornell --accel tensor
run random_cluster 1500 python bench.py --scene random
run random_tensor 1500 python bench.py --scene random --accel tensor
# B5. supercluster cull at bench scale and at scene scale
run super4_bench 1500 env PT_CLUSTER_SUPER=4 python bench.py
run scaling_bunny_sup8 2400 env PT_CLUSTER_STREAM=1 PT_CLUSTER_SUPER=8 python tools/bench_prim_scaling.py --bunny --sizes 2,3
# B6. gallery artifact: 79.5k-tri bunny (beyond the resident VMEM wall)
# rendered end-to-end through the streamed march
run big_scene 2400 python examples/big_scene.py --level 2 --width 640 --spp 8 --out /root/repo/docs/gallery/bunny_79k_stream_640.png
echo "=== chip queue done $(date)" >> $LOG
