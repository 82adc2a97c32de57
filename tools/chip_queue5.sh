#!/bin/bash
# Round-5 chip experiment queue (serialized; never run concurrent TPU work).
# Ordered by information value. Results in /tmp/chip_queue5.log.
set -u
LOG=/tmp/chip_queue5.log
cd /root/repo
export PT_BENCH_NO_PROBE=1
echo "=== chip queue5 start $(date)" >> $LOG

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

# A. the HBM-scale deliverable: sub4 with the fixed cull2 (auto, no knobs)
run sub4_cull2 2400 python bench.py --subdivide 4
# B. sub2 at the new defaults (did anything regress at mid scale?)
run sub2 2400 python bench.py --subdivide 2
# C. fresh official default bench line (double-buffered orddma)
run default 1800 python bench.py
# D. knockout at new defaults: how much fixed cost did the double-buffer
#    + narrow shave? (gate-stub isolates launch+grid; query-stub = floor)
run knockout 3000 python tools/tpu_knockout.py --variants full,kernel-stub,gate-stub,query-stub
# E. cornell + combined official lines (floor trim touches every scene)
run cornell 1800 python bench.py --scene cornell --ray-chunk 115200
run combined 2400 python bench.py --scene combined --ray-chunk 115200
run random 1800 python bench.py --scene random --ray-chunk 115200
run triangle 1800 python bench.py --scene triangle --ray-chunk 115200
echo "=== chip queue5 done $(date)" >> $LOG
