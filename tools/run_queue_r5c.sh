#!/bin/bash
# Round-4 stage-C queue: re-validate the shipped program after the uint8
# pool-residency change (dataset pools now live in HBM as uint8, not
# int32 — 4x less residency/gather traffic), then hand the rest of the
# budget to the long training legs r5b ran out of time for.
#
#   nohup tools/run_queue_r5c.sh <budget_s> &
#
# Serializes on runs/chip.lock (PID liveness); the budget clock starts
# AFTER the lock is acquired so waiting for r5b costs no queue budget.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-21600}
LOG=runs/queue_r5c.log
LOCK=runs/chip.lock

for _ in $(seq 1 960); do
  if [ -f "$LOCK" ]; then
    pid=$(cat "$LOCK" 2>/dev/null || echo "")
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then sleep 30; continue; fi
  fi
  break
done
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT

START=$(date +%s)
echo "=== r5c starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. the shipped bench under the uint8 pool + host-perm scan body (the
#    program the driver will record as BENCH_r04 — must be revalidated
#    after both data-path changes)
run_job bench_uint8_hostperm 1500 \
  python bench.py

# 1b/1c. data-path attribution A/B: the old in-trace-perm scan body and a
#    fixed-batch pure-step diagnostic.  Together with 1 this separates
#    (perm sort + gather) from the step itself — the 16.8 vs 14.8 ms gap.
run_job bench_intrace_perm 1200 \
  env CTGAN_BENCH_DATA=intrace python bench.py
run_job bench_fixed_data 1200 \
  env CTGAN_BENCH_DATA=fixed python bench.py

# 2. fused+uint8 cost account (argument bytes drop 4x for the pool slot)
run_job cost_analysis_uint8 1800 \
  python tools/cost_analysis.py

# 3. long training legs, cheapest-to-close first — resume whatever r5b
#    started (all have checkpoint/resume; rc=124 is a harmless cut)
run_training ssl_cifar_full 7200 runs/ssl_cifar_full.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_full
run_training ssl_te_continue 4800 runs/ssl_te_r5.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5
run_training good64_fresh 7200 runs/good64_r4.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r4 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000
run_training lsun128_fresh 7200 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r4 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== r5c queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
