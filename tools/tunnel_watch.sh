#!/bin/bash
# Axon tunnel watcher. The tunnel has hour-long dead stretches (docs/DESIGN.md,
# round-2 outage ate the official bench artifact): probe the chip on a loop,
# and the moment it answers run the queued chip experiments
# (tools/chip_queue.sh) exactly once, then exit.
#
# Probe = real tiny matmul with block_until_ready, not just backend init —
# the tunnel can accept connections and still stall on execution.
set -u
LOG=${TUNNEL_WATCH_LOG:-/tmp/tunnel_watch.log}
cd /root/repo
echo "=== tunnel watch start $(date)" >> "$LOG"
for i in $(seq 1 300); do
  if timeout 300 python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert "cpu" not in str(d[0]).lower(), d
x = jnp.ones((8, 128))
(x @ x.T).sum().block_until_ready()
print("TPU OK", d)
EOF
  then
    echo "tunnel up $(date) — running chip queue" >> "$LOG"
    bash tools/chip_queue.sh
    echo "chip queue finished $(date)" >> "$LOG"
    exit 0
  fi
  echo "probe $i failed $(date)" >> "$LOG"
  sleep 120
done
echo "=== tunnel watch gave up $(date)" >> "$LOG"
exit 1
