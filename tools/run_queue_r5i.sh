#!/bin/bash
# Round-5 queue, third leg (replaces run_queue_r5h.sh): re-prioritizes the
# chip so the TE 1000-epoch close (VERDICT r4 item 1's Done criterion) gets
# budget FIRST, ahead of the good64/lsun128 depth continuations.
#
# Why: measured TE pace is ~24 s/epoch + ~625 s restart overhead
# (runs/ssl_te_r5/log.ndjson); r5g's remaining plan would strand TE at
# ~epoch 810 and hand it to a follow-on queue too late in the round.
#
# Phase 0 (no lock held): wait for r5g to bank the serve_warm_bench hook
# results we want, then for its good64 leg to write one checkpoint (so
# preemption costs <1 save interval), then take over the lock and preempt
# r5g's whole tree (tools/queue_preempt.py — bench.py's takeover contract).
#
# Phases 1..n (lock held): TE to 1000 → good64 continuation → lsun128 →
# late-stage hook.  Continuation legs assert their "resumed" line exactly
# like run_queue_r5g.sh; good64/lsun first attempts auto-detect whether a
# checkpoint tree exists (r5g may or may not have banked one before the
# preempt) and only then demand a resume line.
#
#   nohup tools/run_queue_r5i.sh <chip_budget_s> &
#
# bench.py may take over the lock at round end and preempt us; every leg
# checkpoints, costing at most one save interval.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-21600}
LOG=runs/queue_r5i.log
LOCK=runs/chip.lock

echo "=== r5i phase-0 (waiting to preempt r5g) $(date -u +%FT%TZ) ===" >> "$LOG"

R5G_PID=$(cat /tmp/r5g.pid 2>/dev/null || true)
WAIT_DEADLINE=$(( $(date +%s) + 13500 ))   # give up waiting by ~13:00Z
SERVE_SEEN=0
SERVE_T0=0
while [ -n "$R5G_PID" ] && kill -0 "$R5G_PID" 2>/dev/null; do
  now=$(date +%s)
  [ "$now" -ge "$WAIT_DEADLINE" ] && { echo "r5i: wait deadline — preempting anyway $(date -u +%FT%TZ)" >> "$LOG"; break; }
  if grep -q "hook serve_warm_bench rc=" runs/queue_r5g.log 2>/dev/null; then
    if [ "$SERVE_SEEN" -eq 0 ]; then SERVE_SEEN=1; SERVE_T0=$now;
      echo "r5i: serve hook done; waiting for a good64 ckpt (≤1500s) $(date -u +%FT%TZ)" >> "$LOG"; fi
    if ls runs/good64_r5/ckpt/*.npz >/dev/null 2>&1; then
      echo "r5i: good64 ckpt banked — preempting $(date -u +%FT%TZ)" >> "$LOG"; break; fi
    if [ $(( now - SERVE_T0 )) -ge 1500 ]; then
      echo "r5i: 1500s past serve hook, no ckpt — preempting $(date -u +%FT%TZ)" >> "$LOG"; break; fi
  fi
  sleep 20
done

if [ -n "$R5G_PID" ] && kill -0 "$R5G_PID" 2>/dev/null; then
  python tools/queue_preempt.py "$LOCK" "$R5G_PID" >> "$LOG" 2>&1
fi

source tools/chiplock.sh
chiplock_acquire "$LOCK" || exit 1
trap 'chiplock_release "$LOCK"' EXIT

START=$(date +%s)   # chip budget starts once we own the chip
echo "=== r5i owns the chip (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. TE to 1000 — the round's top evidence item.  MUST resume.
run_training ssl_te_finish 14400 runs/ssl_te_r5.log 1 \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5

# 2/3. Depth continuations.  expect_resume on the first attempt depends on
#      whether r5g banked a checkpoint before the preempt.
G64_EXPECT=0; ls runs/good64_r5/ckpt/*.npz >/dev/null 2>&1 && G64_EXPECT=1
run_training good64_r5i 10800 runs/good64_r5.log "$G64_EXPECT" \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r5 \
    --ITERS 200000 --save_every 1000 --sample_every 1000 \
    --inception_every 4000 --inception_samples 1000
L128_EXPECT=0; ls runs/lsun128_r5/ckpt/*.npz >/dev/null 2>&1 && L128_EXPECT=1
run_training lsun128_r5i 7200 runs/lsun128_r5.log "$L128_EXPECT" \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r5 \
    --ITERS 200000 --save_every 500 --sample_every 1000

# 4. Anything staged while training ran.
hook late_stage_r5 3600

echo "=== r5i queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
