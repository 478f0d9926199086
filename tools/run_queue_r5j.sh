#!/bin/bash
# Round-5 leg-j queue: the final chip schedule of the build.
#
# State at leg start (VM re-materialized 22:06Z from commit fc3ee11):
#   * ssl_te_r5: untracked ssl_state.npz (epoch 823) wiped AGAIN by the
#     leg boundary; tracked params + log.pkl survive at epoch 548.  The
#     approximate-resume path (utils/resume.py, built for exactly this)
#     restarts at 548 — params exact, optimizer/ensemble re-warmed.
#   * good64_r5 / lsun128_r5: fresh dirs (r5g/r5i legs' trees wiped).
#
# New vs r5i: a DURABILITY COMMITTER loop banks the small resume-critical
# artifacts into git every ~20 min (params every other sweep), so the next
# wipe can cost at most one sweep interval, not 275 epochs.
#
#   nohup tools/run_queue_r5j.sh <budget_s> &
#
# Serializes on runs/chip.lock; bench.py preempts via lock takeover at
# round end (tools/chiplock.sh contract) — every leg checkpoints.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-17400}
LOG=runs/queue_r5j.log
LOCK=runs/chip.lock

source tools/chiplock.sh
chiplock_acquire "$LOCK" || exit 1
COMMIT_PID=
trap 'chiplock_release "$LOCK"; [ -n "$COMMIT_PID" ] && kill "$COMMIT_PID" 2>/dev/null' EXIT

START=$(date +%s)
echo "=== r5j starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

remaining() { echo $(( BUDGET - ($(date +%s) - START) )); }

# Durability committer: logs every sweep, params every other sweep.
(
  sweep=0
  while true; do
    sleep 1200
    sweep=$(( sweep + 1 ))
    if [ $(( sweep % 2 )) -eq 0 ]; then
      tools/commit_progress.sh --with-params >> "$LOG" 2>&1
    else
      tools/commit_progress.sh >> "$LOG" 2>&1
    fi
  done
) & COMMIT_PID=$!

# run_training <name> <max_secs> <logfile> <expect_resume_first:0|1> <cmd...>
# Retries on nonzero rc until the leg budget is spent; rc=0 = schedule done.
# Attempt N>1 and (when expect_resume_first=1) attempt 1 MUST log "resumed"
# in their own log slice — else the leg aborts (QUEUE_ASSERT_FAIL).
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

# 1. TE 548 -> 1000 (CT_CIFAR-10_TE.py:300-309), ~11.3ks at 24 s/epoch.
#    First attempt MUST print "resumed (approximate) ... at epoch 548".
run_training ssl_te_finish 14400 runs/ssl_te_r5.log 1 \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5

# Bank the completed-TE state immediately, params included.
tools/commit_progress.sh --with-params >> "$LOG" 2>&1

# 2/3. good64 / lsun128 depth (VERDICT item 4) with whatever remains.
run_training good64_r5 3900 runs/good64_r5.log 0 \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r5 \
    --ITERS 200000 --save_every 1000 --sample_every 1000 \
    --inception_every 4000 --inception_samples 1000
run_training lsun128_r5 14400 runs/lsun128_r5.log 0 \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r5 \
    --ITERS 200000 --save_every 500 --sample_every 1000

tools/commit_progress.sh --with-params >> "$LOG" 2>&1
echo "=== r5j queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
