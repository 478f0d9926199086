#!/bin/bash
# Round-4 stage-F queue: replaces r5e (killed before it acquired the lock).
# New first stage: serving-throughput benches for the new
# `generate --serve_iters` path (flagship bf16+fp32 from the 25k-iter
# trained checkpoint, good64 from its live checkpoint, lsun128 fresh-init)
# — ~5-20 min total, the only chip evidence the serving path needs.
# Then exactly r5e's legs: close the TE 1000-epoch schedule, continue
# good64/lsun128 toward the 200k reference schedules.
#
#   nohup tools/run_queue_r5f.sh <budget_s> &
#
# Serializes on runs/chip.lock via tools/chiplock.sh; budget clock starts
# after acquisition.  bench.py may preempt this queue at round end —
# every training leg checkpoints, so that costs at most one save interval.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-36000}
LOG=runs/queue_r5f.log
LOCK=runs/chip.lock

source tools/chiplock.sh
chiplock_acquire "$LOCK" || exit 1
trap 'chiplock_release "$LOCK"' EXIT

START=$(date +%s)
echo "=== r5f starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

remaining() { echo $(( BUDGET - ($(date +%s) - START) )); }

run_once() {  # run_once <name> <max_secs> <logfile> <cmd...>  (no retry)
  local name=$1 max=$2 tlog=$3; shift 3
  local left; left=$(remaining)
  if [ "$left" -le 120 ]; then
    echo "=== SKIP $name (deadline) $(date -u +%FT%TZ) ===" >> "$LOG"
    return
  fi
  local t=$(( max < left ? max : left ))
  echo "=== $name (budget ${t}s) $(date -u +%FT%TZ) ===" >> "$LOG"
  timeout "$t" "$@" >> "$tlog" 2>&1
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

latest_ckpt() { ls -v "$1"/ckpt_*.npz 2>/dev/null | tail -1; }

# 1. Serving benches (one JSON line each into runs/serve_bench_r4.log)
FLAG_CKPT=$(latest_ckpt runs/flagship_fused_r4/ckpt)
run_once serve_flagship_bf16 1500 runs/serve_bench_r4.log \
  python -m ctgan_tpu.apps.generate --model cifar_resnet \
    --ckpt "$FLAG_CKPT" --batch 1024 --serve_iters 50 --bf16 true
run_once serve_flagship_fp32 1500 runs/serve_bench_r4.log \
  python -m ctgan_tpu.apps.generate --model cifar_resnet \
    --ckpt "$FLAG_CKPT" --batch 1024 --serve_iters 50 --bf16 false
GOOD_CKPT=$(latest_ckpt runs/good64_r4/ckpt)
run_once serve_good64_bf16 1500 runs/serve_bench_r4.log \
  python -m ctgan_tpu.apps.generate --model good64 --dim 64 \
    --ckpt "$GOOD_CKPT" --batch 256 --serve_iters 30 --bf16 true
run_once serve_lsun128_bf16 1500 runs/serve_bench_r4.log \
  python -m ctgan_tpu.apps.generate --model lsun128 \
    --batch 64 --serve_iters 30 --bf16 true

# 2. Close whichever 1000-epoch SSL schedule is still open (exact resume;
#    a closed schedule exits immediately at ~0 cost).
run_training ssl_te_close 10800 runs/ssl_te_r5.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5

# 3/4. good64 / lsun128 schedule depth (200k reference schedules; the
#      deliverable is depth + resume evidence, not completion).
run_training good64_continue2 10800 runs/good64_r4.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r4 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000
run_training lsun128_continue2 10800 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r4 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== r5f queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
