#!/bin/bash
# Follow-up chip queue: re-runs of entries that failed in the first
# round-3 batch (grouped W>=4 hit the rank-1 tpu.concatenate Mosaic wall
# before the rank-2 mask fix; the scaling/knockout tools crashed on a
# missing sys.path insert), plus clean re-measures of apparent winners
# (entries timed while host CPU work overlapped are suspect — the tunnel
# client does host-side work per call, docs/DESIGN.md).
set -u
LOG=/tmp/chip_queue.log
cd /root/repo
export PT_BENCH_NO_PROBE=1
echo "=== chip queue2 start $(date)" >> $LOG

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
  for i in $(seq 1 12); do
    probe && break
    echo "... tunnel lost before $name, probe $i failed $(date +%H:%M:%S)" >> $LOG
    sleep 120
  done
  echo "--- $name $(date +%H:%M:%S)" >> $LOG
  timeout "$to" "$@" 2>&1 | grep -v -i warning | tail -12 >> $LOG
}

# the W question, post-fix (K=128: W divides MXU issues per cluster)
run wide4_grp 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 python bench.py
run wide8_grp 2400 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python bench.py
# clean re-measure: k32_w8_split's 13.83 overlapped host CPU work
run k32_w8_split 2400 env PT_CLUSTER_K=32 PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
# streamed march (burned pre-DMA-alignment-fix in tier A)
run stream_bench 1800 env PT_CLUSTER_STREAM=1 python bench.py
run scaling_stream 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --sizes 5000,20000,45000,100000,200000
# real-geometry sub-linearity (crashed on import last time)
run scaling_bunny 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --bunny --sizes 0,1,2,3
run scaling_bunny_sup8 2400 env PT_CLUSTER_STREAM=1 PT_CLUSTER_SUPER=8 python tools/bench_prim_scaling.py --bunny --sizes 2,3
# counter-hash bounce RNG (whole-render rng A/B: stub saves 72 ms, the
# fast threefry only 14 — hash replaces the 20 threefry rounds)
run rng_hash 1500 env PT_RNG_HASH=1 python bench.py
run rng_hash_lean 1500 env PT_RNG_HASH=1 PT_RNG_LEAN=1 python bench.py
# chunk-size amortization beyond 230k: resident 461k hits the same SMEM
# prefetch-table wall as 230k, so only the streamed variant is viable
run c461k_stream 2400 env PT_CLUSTER_STREAM=1 python bench.py --ray-chunk 460800
# winner combos around the tier-B singles podium (k128_w4_split 16.88,
# k256 16.26, wide3 15.35, pipe 13.54; W=16 resident hits scoped-VMEM
# OOM 18.47M > 16M):
run k128_w8_split 2400 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run k256_w4_split 2400 env PT_CLUSTER_K=256 PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run k128w4sp_pipe 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 PT_CLUSTER_PIPE=1 python bench.py
run k128w4sp_hash 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 PT_RNG_HASH=1 python bench.py
run k256_pipe 1800 env PT_CLUSTER_K=256 PT_CLUSTER_PIPE=1 python bench.py
run k256_w8_split 2400 env PT_CLUSTER_K=256 PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 python bench.py
run k512 1800 env PT_CLUSTER_K=512 python bench.py
run k128w4sp_pipe_hash 2400 env PT_CLUSTER_WIDE=4 PT_CLUSTER_GROUPED=1 PT_CLUSTER_SPLIT=1 PT_CLUSTER_PIPE=1 PT_RNG_HASH=1 python bench.py

echo "=== chip queue2 done $(date)" >> $LOG
