#!/bin/bash
# Session-4 tail: chip A/B for the fused conv+mean_pool stride-2 rewrite
# (blocks.FUSE_MEANPOOL_CONV — removes the pre-pool activation + VJP
# broadcast, ~2.25x fewer MACs on the K=3 down-convs).  Waits for the
# r4b tail to finish (which itself waits for the r4b queue), with a hard
# deadline so a wedged predecessor cannot strand this leg.
#
#   nohup tools/run_tail_r4c.sh <wait_secs> <run_secs> &
set -u
cd "$(dirname "$0")/.."
WAIT_BUDGET=${1:-43200}
RUN_BUDGET=${2:-7200}
LOG=runs/tail_r4c.log
START=$(date +%s)

echo "=== r4c waiting for r4b tail (max ${WAIT_BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"
while true; do
  grep -qE "tail complete|aborting tail" runs/tail_r4b.log 2>/dev/null && break
  [ $(( $(date +%s) - START )) -ge "$WAIT_BUDGET" ] && {
    echo "=== wait deadline; predecessor still running — aborting r4c $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  }
  sleep 60
done
echo "=== predecessor done; r4c starting $(date -u +%FT%TZ) ===" >> "$LOG"

RSTART=$(date +%s)
remaining() { echo $(( RUN_BUDGET - ($(date +%s) - RSTART) )); }

run_job() {  # run_job <name> <max_secs> <cmd...>
  local name=$1 max=$2; shift 2
  local left; left=$(remaining)
  if [ "$left" -le 120 ]; then
    echo "=== SKIP $name (deadline) $(date -u +%FT%TZ) ===" >> "$LOG"
    return
  fi
  local t=$(( max < left ? max : left ))
  echo "=== $name (budget ${t}s) $(date -u +%FT%TZ) ===" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "=== $name rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
}

# flagship A/B: base arm re-measured in the same process for a clean pair
run_job bench_resnet_mpf 2400 \
  python tools/bench_all.py --workloads resnet,resnet_mpf --iters 10

# confirm the mechanism, not just the stopwatch: with the fuse on, the
# broadcast/reduce HBM categories must fall in the optimized HLO
run_job hlo_resnet_mpf 1800 \
  env CTGAN_FUSE_MEANPOOL=1 python tools/hlo_breakdown.py --workload resnet \
    --top 15 --dump runs/hlo_resnet_mpf.txt.gz

# good64 carries the same block structure at 9x the absolute step time;
# its compile alone is ~500-1100 s per arm
run_job bench_good64_mpf 4200 \
  python tools/bench_all.py --workloads good64,good64_mpf --iters 5

echo "=== r4c complete $(date -u +%FT%TZ) ===" >> "$LOG"
