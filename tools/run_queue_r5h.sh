#!/bin/bash
# Round-5 follow-on queue: launched while r5g still owns the chip lock;
# blocks on chiplock_acquire until r5g exits, then spends its budget
# (a) finishing the TE 1000-epoch schedule and (b) deepening the
# good64/lsun128 200k schedules from the r5g checkpoints.  Every leg here
# is a CONTINUATION — a leg that trains without printing "resumed" is
# aborted (same contract as run_queue_r5g.sh).
#
#   nohup tools/run_queue_r5h.sh <budget_s> &
#
# bench.py may take over the lock at round end and preempt us; every leg
# checkpoints, costing at most one save interval.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-10800}
LOG=runs/queue_r5h.log
LOCK=runs/chip.lock

source tools/chiplock.sh
chiplock_acquire "$LOCK" || exit 1
trap 'chiplock_release "$LOCK"' EXIT

START=$(date +%s)
echo "=== r5h starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

remaining() { echo $(( BUDGET - ($(date +%s) - START) )); }

# run_training <name> <max_secs> <logfile> <expect_resume_first:0|1> <cmd...>
run_training() {
  local name=$1 max=$2 tlog=$3 expect_first=$4; shift 4
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
    local expect=1
    [ "$attempt" -eq 1 ] && expect=$expect_first
    local off; off=$(wc -l < "$tlog" 2>/dev/null || echo 0)
    echo "--- $name attempt $attempt (${t}s left, expect_resume=$expect) $(date -u +%FT%TZ)" >> "$LOG"
    timeout "$t" "$@" >> "$tlog" 2>&1
    local rc=$?
    local slice; slice=$(tail -n +"$(( off + 1 ))" "$tlog" 2>/dev/null)
    local resumed; resumed=$(printf '%s' "$slice" | grep -m1 "resumed" || true)
    echo "--- $name attempt $attempt rc=$rc resumed='${resumed:0:90}' $(date -u +%FT%TZ)" >> "$LOG"
    if [ "$expect" -eq 1 ] && [ -z "$resumed" ] \
       && printf '%s' "$slice" | grep -q "^iter "; then
      echo "!!! QUEUE_ASSERT_FAIL $name: attempt $attempt trained without a 'resumed' line — aborting leg" >> "$LOG"
      break
    fi
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 124 ] && break
    attempt=$(( attempt + 1 ))
    [ "$attempt" -gt 12 ] && break
    sleep 30
  done
}

# 1. TE to 1000 (whatever late_stage_r5 left undone; rc=0 when complete).
run_training ssl_te_finish 7200 runs/ssl_te_r5.log 1 \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5

# 2/3. Depth continuations from the r5g checkpoint trees.
run_training good64_r5h 5400 runs/good64_r5.log 1 \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r5 \
    --ITERS 200000 --save_every 1000 --sample_every 1000 \
    --inception_every 4000 --inception_samples 1000
run_training lsun128_r5h 5400 runs/lsun128_r5.log 1 \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r5 \
    --ITERS 200000 --save_every 500 --sample_every 1000

echo "=== r5h queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
