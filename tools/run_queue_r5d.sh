#!/bin/bash
# Round-4 stage-D queue: schedule-depth continuations, cheapest-to-CLOSE
# first.  ssl_cifar_full is ~580 epochs (~15.5 s/epoch) from the 1000-epoch
# reference schedule — one leg closes it outright; TE is next-cheapest;
# good64/lsun128 eat whatever budget remains (200k iters is multi-day, the
# deliverable is depth + resume evidence, not completion).
#
#   nohup tools/run_queue_r5d.sh <budget_s> &
#
# Serializes on runs/chip.lock (PID liveness); budget clock starts after
# acquisition.  bench.py may preempt this queue (SIGTERM tree) at round
# end — every leg checkpoints, so that costs at most one save interval.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-36000}
LOG=runs/queue_r5d.log
LOCK=runs/chip.lock

# Wait for the lock; require it free on TWO polls 20s apart before
# claiming — bench.py preemption of the current holder can open a
# transient free window (the holder's EXIT trap rm's the file a beat
# before bench re-heals it with its own pid) and grabbing the chip
# inside that window would corrupt the round-end measurement.
lock_free() {
  if [ -f "$LOCK" ]; then
    pid=$(cat "$LOCK" 2>/dev/null || echo "")
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then return 1; fi
  fi
  return 0
}
for _ in $(seq 1 1440); do
  if lock_free; then
    sleep 20
    lock_free && break
  fi
  sleep 30
done
echo $$ > "$LOCK"
# Only remove the lock we still own (bench may have taken it over).
trap '[ "$(cat "$LOCK" 2>/dev/null)" = "$$" ] && rm -f "$LOCK"' EXIT

START=$(date +%s)
echo "=== r5d starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. CLOSE the 1000-epoch CIFAR-SSL schedule (at epoch 420 after r5c)
run_training ssl_cifar_close 12000 runs/ssl_cifar_full.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_full

# 2. TE depth (r5c leg started this dir fresh; continue toward 1000)
run_training ssl_te_deepen 10800 runs/ssl_te_r5.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5

# 3/4. good64 / lsun128 continuation from the r5c fresh-leg checkpoints
run_training good64_continue 7200 runs/good64_r4.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r4 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000
run_training lsun128_continue 7200 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r4 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== r5d queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
