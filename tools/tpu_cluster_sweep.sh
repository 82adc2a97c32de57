#!/bin/bash
# Parameter sweep of the cluster closest-hit on the real chip.
# Each config is a fresh process (compile ~2 min each); results append to
# /tmp/cluster_sweep.log
cd /root/repo
run() {
  echo "=== $*" >> /tmp/cluster_sweep.log
  env "$@" python bench.py --accel cluster --iters 3 --ray-chunk "${CHUNK:-57600}" \
    >> /tmp/cluster_sweep.log 2>/dev/null
}
: > /tmp/cluster_sweep.log
CHUNK=57600 run PT_CLUSTER_WINDOW=4
CHUNK=57600 run PT_CLUSTER_WINDOW=2
CHUNK=57600 run PT_CLUSTER_WINDOW=8 PT_CLUSTER_MAX_ROUNDS=2
CHUNK=57600 run PT_CLUSTER_SORT=0
CHUNK=230400 run PT_CLUSTER_WINDOW=4
CHUNK=57600 run PT_CLUSTER_RAY_TILE=256
CHUNK=57600 run PT_CLUSTER_RAY_TILE=512 PT_CLUSTER_WINDOW=2
CHUNK=57600 run PT_CLUSTER_K=256 PT_CLUSTER_WINDOW=2
echo DONE >> /tmp/cluster_sweep.log
