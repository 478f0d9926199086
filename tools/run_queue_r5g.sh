#!/bin/bash
# Round-5 queue: recover + close the TE 1000-epoch schedule, then depth on
# good64/lsun128 (fresh dirs — their ckpt trees were lost at the round-4
# boundary; the old dirs' guards would correctly refuse a silent restart).
#
# New vs r5f (VERDICT r4 item 1c): every training attempt that SHOULD
# resume is asserted to have printed a "resumed" line in its own log slice;
# a leg that trained without resuming is aborted loudly instead of being
# allowed to overwrite history.  (The in-app guard utils/resume.py is the
# primary defense — it exits REFUSING — this is the queue-side check.)
#
#   nohup tools/run_queue_r5g.sh <budget_s> &
#
# Serializes on runs/chip.lock via tools/chiplock.sh; bench.py may preempt
# at round end — every leg checkpoints, costing at most one save interval.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-36000}
LOG=runs/queue_r5g.log
LOCK=runs/chip.lock

source tools/chiplock.sh
chiplock_acquire "$LOCK" || exit 1
trap 'chiplock_release "$LOCK"' EXIT

START=$(date +%s)
echo "=== r5g starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

remaining() { echo $(( BUDGET - ($(date +%s) - START) )); }

# run_training <name> <max_secs> <logfile> <expect_resume_first:0|1> <cmd...>
# Retries on nonzero rc (watchdog exit 3, transient tunnel errors) until the
# leg budget is spent; rc=0 means the schedule completed.  Attempt N>1 and
# (when expect_resume_first=1) attempt 1 MUST log "resumed" in their own log
# slice — otherwise the leg is aborted with QUEUE_ASSERT_FAIL.
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

hook() {  # hook <name> <max_secs> — run tools/<name>.sh if it appeared
  local name=$1 max=$2
  if [ -x "tools/$name.sh" ]; then
    local left; left=$(remaining)
    local t=$(( max < left ? max : left ))
    [ "$t" -le 120 ] && return
    echo "=== hook $name (budget ${t}s) $(date -u +%FT%TZ) ===" >> "$LOG"
    timeout "$t" "tools/$name.sh" >> "runs/$name.log" 2>&1
    echo "=== hook $name rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
  fi
}

# 1. TE recovery + close: approximate resume at epoch 500 from the
#    git-restored params (the clobbered epochs 1-67 state was discarded;
#    see VALIDATION.md round-5 incident recovery).  MUST print "resumed".
run_training ssl_te_close 14400 runs/ssl_te_r5.log 1 \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5

# 2. Mid-queue hook: serving warm-cache bench (VERDICT r4 item 3) — the
#    script lands while the TE leg runs.
hook serve_warm_bench 3600

# 3/4. good64 / lsun128 depth in FRESH dirs (old ckpt trees lost at the
#      round boundary; logs/params_latest now persist cross-leg).  First
#      attempts start fresh by design; every retry must resume.
run_training good64_r5 12600 runs/good64_r5.log 0 \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r5 \
    --ITERS 200000 --save_every 1000 --sample_every 1000 \
    --inception_every 4000 --inception_samples 1000
run_training lsun128_r5 9000 runs/lsun128_r5.log 0 \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r5 \
    --ITERS 200000 --save_every 500 --sample_every 1000

# 5. Late hook: anything staged while training ran.
hook late_stage_r5 3600

echo "=== r5g queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
