#!/bin/bash
# Round-3 wave-2 chip queue: combos the wave-1 podium (w8_grp 19.12,
# k128_w4_split 16.88, k256 16.26) points at but queue2 doesn't cover —
# W=16 via the streamed tables (the resident W=16 scoped-VMEM OOM does
# not apply: only W double-buffered blocks live in VMEM), K=256 x W=8
# (halves window count at fixed lanes), W=8 + hash RNG, and launch-count
# amortization via big streamed chunks. All pre-flight lowering-checked
# (tools/tpu_lowering_check.py).
set -u
LOG=/tmp/chip_queue.log
cd /root/repo
export PT_BENCH_NO_PROBE=1
echo "=== chip queue3 start $(date)" >> $LOG

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

# re-runs: queue2's scaling entries imported pre-fix code and hit the
# rank-2 order-table multi-tile DMA wall at C_reg >= 129 (fixed: rank-3
# (n_chunks, M_pad//128, 128) tables, untiled leading dim)
run scaling_stream 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --sizes 5000,20000,45000,100000,200000
run scaling_bunny 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --bunny --sizes 0,1,2,3
run w8_grp_hash 1800 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_RNG_HASH=1 python bench.py
# 2048-lane windows abort at the 16 MB scoped-VMEM default (queue2
# k256_w8_split: 18.51M; resident W=16: 18.47M) — retry with the budget
# raised to 32 MB (whether the chip has headroom is the experiment)
run stream_w16_grp 2400 env PT_CLUSTER_VMEM_MB=32 PT_CLUSTER_STREAM=1 PT_CLUSTER_WIDE=16 PT_CLUSTER_GROUPED=1 python bench.py
run k256_w8_grp 2400 env PT_CLUSTER_VMEM_MB=32 PT_CLUSTER_K=256 PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python bench.py
run w16_grp_vmem32 2400 env PT_CLUSTER_VMEM_MB=32 PT_CLUSTER_WIDE=16 PT_CLUSTER_GROUPED=1 python bench.py
run stream_w8_461k 2400 env PT_CLUSTER_STREAM=1 PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python bench.py --ray-chunk 460800
run w8_grp_pipe 2400 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_PIPE=1 python bench.py
# parallel grid-dim semantics (Mosaic double-buffers per-step block DMAs;
# targets the ~94 ms grid-step share) — same-process A/B with image diff
run parsem_ab 3600 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python tools/tpu_ab_guard.py --envs ",PT_CLUSTER_PARSEM=1"
# tile 256 re-test at W=8 (halves grid steps; the W=2 loss may flip now
# that window epilogues are amortized over wide lanes)
run w8_tile256 2400 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 PT_CLUSTER_RAY_TILE=256 python bench.py
# fresh whole-render attribution at the W=8 winner config (the 805 ms
# knockout table predates every wide/grouped win; RNG A/Bs show the old
# 72 ms RNG share was a cross-process outlier - re-attribute before
# optimizing the wrong floor component)
run knockout_w8 3600 env PT_CLUSTER_WIDE=8 PT_CLUSTER_GROUPED=1 python tools/tpu_knockout.py --variants full,gate-stub,kernel-stub,query-stub

echo "=== chip queue3 done $(date)" >> $LOG
