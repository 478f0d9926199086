#!/bin/bash
# Wait for the TPU tunnel to come back, then launch the r4 chip queue.
#
#   nohup tools/wait_tpu_then_queue.sh <queue_budget_s> [max_wait_s] &
#
# Probes the tunnel with a bounded jax.devices()+matmul every 3 minutes.
# When a probe succeeds, hands the remaining time (capped at queue_budget_s)
# to tools/run_queue_r4.sh. Gives up after max_wait_s (default 4h).
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-36000}
MAX_WAIT=${2:-14400}
START=$(date +%s)
LOG=runs/tpu_wait.log

probe() {
  timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu"
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
EOF
}

while true; do
  elapsed=$(( $(date +%s) - START ))
  if [ "$elapsed" -ge "$MAX_WAIT" ]; then
    echo "give up waiting after ${elapsed}s $(date -u +%FT%TZ)" >> "$LOG"
    exit 1
  fi
  if probe; then
    echo "tunnel alive after ${elapsed}s $(date -u +%FT%TZ)" >> "$LOG"
    break
  fi
  echo "tunnel down (${elapsed}s) $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done

left=$(( BUDGET ))
echo "launching queue (budget ${left}s) $(date -u +%FT%TZ)" >> "$LOG"
exec tools/run_queue_r4.sh "$left"
