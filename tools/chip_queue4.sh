#!/bin/bash
# Round-3 wave-3: confirm the flipped defaults on chip (a plain
# `python bench.py` must hit the measured W=8-grouped number with NO env
# overrides — this is the exact invocation the driver records as
# BENCH_r03), plus the full-default cornell/random sanity rows under
# accel=auto.
set -u
LOG=/tmp/chip_queue.log
cd /root/repo
export PT_BENCH_NO_PROBE=1
echo "=== chip queue4 start $(date)" >> $LOG

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

run default_bench 2400 python bench.py
run default_cornell 1800 python bench.py --scene cornell
run default_random 1800 python bench.py --scene random
# config-5 production scene at bench shapes (NEE, no sky, auto->cluster)
run default_combined 2400 python bench.py --scene combined
# sub-linearity sweep, one size per entry (each size pays ~10-20 min of
# march+dense axon compile; the combined-sizes entries kept timing out
# after two sizes)
run scaling_45k 3000 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --sizes 45000
run scaling_100k 3000 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --sizes 100000
run scaling_200k 3600 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --sizes 200000
run scaling_bunny_l2 3000 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --bunny --sizes 2
run scaling_bunny_l3 3600 env PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py --bunny --sizes 3
# flagship preset at the flipped defaults -> gallery artifact
run bunny_preset 3600 python -m pathtracer_tpu --preset bunny -o docs/gallery/bunny_800x450_128spp_r3.png

echo "=== chip queue4 done $(date)" >> $LOG
