#!/bin/bash
# Round-4/5 stage-E queue: pick up whatever r5d's budget cut.  r5d closes
# the 1000-epoch CIFAR-SSL schedule, deepens TE, then continues
# good64/lsun128; anything rc=124 there resumes here from its checkpoint.
#
#   nohup tools/run_queue_r5e.sh <budget_s> &
#
# Serializes on runs/chip.lock via tools/chiplock.sh (atomic acquisition —
# safe to launch while r5d still runs or even if launched twice); budget
# clock starts after acquisition.  bench.py may preempt this queue
# (takeover + SIGTERM tree) at round end — every leg checkpoints, so that
# costs at most one save interval.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-36000}
LOG=runs/queue_r5e.log
LOCK=runs/chip.lock

source tools/chiplock.sh
chiplock_acquire "$LOCK" || exit 1
trap 'chiplock_release "$LOCK"' EXIT

START=$(date +%s)
echo "=== r5e starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

remaining() { echo $(( BUDGET - ($(date +%s) - START) )); }

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

# 1. Close whichever 1000-epoch SSL schedule is still open (exact resume;
#    a closed schedule exits immediately at ~0 cost).
run_training ssl_cifar_close2 7200 runs/ssl_cifar_full.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_full
run_training ssl_te_close 10800 runs/ssl_te_r5.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5

# 2/3. good64 / lsun128 schedule depth (200k reference schedules; the
#      deliverable is depth + resume evidence, not completion).
run_training good64_continue2 10800 runs/good64_r4.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r4 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000
run_training lsun128_continue2 10800 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r4 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== r5e queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
