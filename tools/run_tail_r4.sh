#!/bin/bash
# Round-4 chip tail: runs after tools/run_queue_r4.sh exits, in the slack
# before the driver bench.  Uses the queue's sweep results to measure the
# CLEAN flag combo (loss-matching improvers only — the in-queue combo was
# computed before the loss gate landed and may be unadoptable), re-adopts
# whichever arm is fastest across BOTH logs, then pre-validates bench.py
# under the final tuned flags.
#
#   nohup tools/run_tail_r4.sh <budget_secs> &
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-5400}
START=$(date +%s)
LOG=runs/tail_r4.log

remaining() { echo $(( BUDGET - ($(date +%s) - START) )); }

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

# 1. base + merged clean combo, 2 compiles (~6-10 min on the tunnel)
run_job combo_probe 2400 \
  python tools/layout_ab.py --iters 10 --combo_from runs/queue_r4.log

# 1b. the model-level NCHW-order arm the wedged sweep never reached
#     (options=None sentinel — never auto-adopted, measured for the record;
#     compares against the combo probe's fresh base in this same log)
run_job nchw_probe 1500 \
  python tools/layout_ab.py --iters 10 --arms nchw_hint

# 2. pick the fastest loss-matching arm across the full sweep AND the combo;
#    the tail's fresh base supersedes the sweep's (last-per-arm dedup)
cat runs/queue_r4.log "$LOG" > runs/_adopt_all_r4.log 2>/dev/null
run_job adopt_final 2400 \
  python tools/adopt_layout_winner.py --log runs/_adopt_all_r4.log --apply \
    --confirm runs/hlo_resnet_tuned2_r4.txt.gz

# 3. bench under the final tuned flags — what the driver will run at round end
run_job bench_final 1800 python bench.py

# 4. spare time goes to extending the CIFAR-SSL schedule (resumable)
left=$(remaining)
if [ "$left" -gt 900 ]; then
  echo "=== ssl_cifar_resume (budget $((left-300))s) $(date -u +%FT%TZ) ===" >> "$LOG"
  timeout $(( left - 300 )) python -m ctgan_tpu.apps.ct_cifar_ssl \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_cifar_r3 \
    >> runs/ssl_cifar_r4.log 2>&1
  echo "=== ssl_cifar_resume rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
fi

echo "=== tail complete $(date -u +%FT%TZ) ===" >> "$LOG"
