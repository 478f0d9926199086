#!/bin/bash
# SUPERSEDED by run_queue_r5a.sh / run_queue_r5b.sh (round 4): those
# serialize on a PID lockfile (runs/chip.lock) instead of this script's
# log-mtime gate, which ADVICE r3 correctly flagged as racy (XLA compiles
# keep the log silent for >300 s).  Kept for the record of what was
# queued at the end of round 3.
#
# Round-4 long-leg queue: the jobs too expensive for a ~1 h session,
# in priority order.  Everything here is resumable or harmless to kill.
# Waits for run_queue_r4e.sh (if running) by watching its log go quiet.
#
#   nohup tools/run_queue_r4f.sh <budget_s> &
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-36000}
START=$(date +%s)
LOG=runs/queue_r4f.log

echo "=== r4f waiting for r4e (log-quiet test) $(date -u +%FT%TZ) ===" >> "$LOG"
for _ in $(seq 1 120); do
  [ -f runs/queue_r4e.log ] || break
  grep -q "r4e queue complete" runs/queue_r4e.log && break
  age=$(( $(date +%s) - $(stat -c %Y runs/queue_r4e.log) ))
  [ "$age" -ge 300 ] && break
  sleep 30
done
echo "=== r4f starting $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. good64 byte attribution (ROADMAP #4) — compile alone ~500-1100 s;
#    timed out twice before at smaller budgets
run_job hlo_breakdown_good64 4200 \
  python tools/hlo_breakdown.py --workload good64 --top 20 \
    --dump runs/hlo_good64_r4.txt.gz

# 2. FUSE_MEANPOOL on good64 — same lever at ~9x the flagship's absolute
#    step time (two long compiles)
run_job bench_good64_mpf 4200 \
  python tools/bench_all.py --workloads good64,good64_mpf --iters 5

# 3. the complete reference CIFAR-SSL schedule (CT_CIFAR.py:175 = 1000
#    epochs); epoch-scan checkpointing makes timeouts harmless
run_training ssl_cifar_full 21600 runs/ssl_cifar_full.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_full

# 4. continue the 200k-iteration reference schedules from the round-3
#    checkpoints (resumable; gitignored ckpt dirs on disk)
run_training good64_continue 10800 runs/good64_r4.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r3 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000
run_training lsun128_continue 10800 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r3 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== r4f queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
