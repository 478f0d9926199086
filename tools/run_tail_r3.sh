#!/bin/bash
# Round-3 tail chip schedule: runs AFTER the main queue is stopped, sized to
# free the chip before the end-of-round driver bench.
#
#   tools/run_tail_r3.sh [total_budget_seconds]
#
# Jobs (serialized, deadline-bounded):
#   1. hlo_breakdown good64 + resnet with --dump (validate the TPU HLO text
#      parser on hardware; the dump makes offline iteration possible)
#   2. flagship HBM-byte-cut A/B (clean_pass off / remat on) — VERDICT r2 #7
#   3. ct_cifar_ssl 1000-epoch schedule (epoch_scan)          — VERDICT r2 #3
#   4. ct_cifar_ssl --temporal_ensembling same schedule       — VERDICT r2 #3
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-7200}
START=$(date +%s)
LOG=runs/tail_r3.log

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

run_training() {  # run_training <name> <max_secs> <logfile> <cmd...>
  local name=$1 max=$2 tlog=$3; shift 3
  local left; left=$(remaining)
  if [ "$left" -le 300 ]; then
    echo "=== SKIP $name (deadline) $(date -u +%FT%TZ) ===" >> "$LOG"
    return
  fi
  local budget=$(( max < left ? max : left ))
  local jstart=$(date +%s)
  echo "=== $name (budget ${budget}s) $(date -u +%FT%TZ) ===" >> "$LOG"
  local attempt=1
  while true; do
    local spent=$(( $(date +%s) - jstart ))
    local t=$(( budget - spent ))
    [ "$t" -le 300 ] && break
    echo "--- $name attempt $attempt (${t}s left) $(date -u +%FT%TZ)" >> "$LOG"
    timeout "$t" "$@" >> "$tlog" 2>&1
    local rc=$?
    echo "--- $name attempt $attempt rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 124 ] && break
    attempt=$(( attempt + 1 ))
    [ "$attempt" -gt 12 ] && break
    sleep 30
  done
}

run_job hlo_breakdown_resnet 900 \
  python tools/hlo_breakdown.py --workload resnet --top 20 \
    --dump runs/hlo_resnet_r3.txt.gz
run_job flagship_ab 1800 \
  python tools/bench_all.py --workloads resnet,resnet_ab --iters 10
run_job cost_resnet_noclean 600 \
  python tools/cost_analysis.py --workload resnet --noclean

# resume the queue's lsun128 run for a short leg: proves chip
# checkpoint/resume for this workload AND measures the zero-host-feed
# input path (state.step-indexed DeviceSampler) against the 0.49 s/iter
# data-time column the original leg logged
run_training lsun128_resume 1500 runs/lsun128_r3.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r3 \
    --ITERS 200000 --save_every 500 --sample_every 500

# SSL at-schedule evidence (VERDICT r2 #3) gets the bulk of the budget;
# each job leaves resumable state + curves even when deadline-cut.
run_training ssl_cifar 2700 runs/ssl_cifar_r3.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_r3
run_training ssl_cifar_te 2100 runs/ssl_te_r3.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --temporal_ensembling true --out_dir runs/ssl_te_r3

# byte attribution for good64 only if slack remains (the summary JSON is
# already recorded; this adds the per-category table + offline dump)
run_job hlo_breakdown_good64 1500 \
  python tools/hlo_breakdown.py --workload good64 --top 20 \
    --dump runs/hlo_good64_r3.txt.gz

echo "=== tail queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
