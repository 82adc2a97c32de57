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
# real-geometry sub-linearity (crashed on import last time)
run scaling_bunny 2400 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --bunny --sizes 0,1,2,3
run scaling_bunny_sup8 2400 env PT_CLUSTER_STREAM=1 PT_CLUSTER_SUPER=8 python tools/bench_prim_scaling.py --bunny --sizes 2,3

echo "=== chip queue2 done $(date)" >> $LOG
