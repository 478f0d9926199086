#!/bin/bash
# Round-3 TPU evidence queue (VERDICT r2 #2/#3/#6): serialized chip jobs,
# never two TPU processes at once, everything deadline-bounded so the chip
# is free for the driver's end-of-round bench.
#
#   tools/run_queue_r3.sh [total_budget_seconds]
#
# Jobs (in order):
#   1. measure_tp          — unfused TP-mode dispatch overhead on hardware
#   2. hlo_breakdown       — good64 HBM-traffic attribution (full size)
#   3. good64 at-schedule  — IS/FID cadence + crash/resume supervision
#   4. lsun128 at-schedule — sample grids + crash/resume
#   5. ct_cifar_ssl        — 1000-epoch reference schedule (epoch_scan mode)
#   6. ct_cifar_ssl --temporal_ensembling — same schedule
# Each training job checkpoints continuously, so a deadline cut still
# leaves curves + resumable state.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-27000}   # default 7.5h
START=$(date +%s)
LOG=runs/queue_r3.log

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

# resume-supervised training run: restart on crash until its budget is spent
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
    [ "$rc" -eq 0 ] && break     # schedule complete
    [ "$rc" -eq 124 ] && break   # budget cut — checkpoints remain
    attempt=$(( attempt + 1 ))
    [ "$attempt" -gt 12 ] && break
    sleep 30
  done
}

run_job measure_tp 1800 python tools/measure_tp.py --iters 30
run_job hlo_breakdown_good64 2400 python tools/hlo_breakdown.py --workload good64 --top 20
run_job hlo_breakdown_resnet 1800 python tools/hlo_breakdown.py --workload resnet --top 20

run_training good64_sched 8400 runs/good64_r3.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r3 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000

run_training lsun128_sched 6600 runs/lsun128_r3.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r3 \
    --ITERS 200000 --save_every 1000 --sample_every 500

run_training ssl_cifar 4200 runs/ssl_cifar_r3.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_r3

run_training ssl_cifar_te 4200 runs/ssl_te_r3.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --temporal_ensembling true --out_dir runs/ssl_te_r3

echo "=== queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
