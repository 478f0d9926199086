#!/bin/bash
# Round-4 stage-A queue: the short chip legs that gate this round's
# decisions, in priority order (VERDICT r3 "Next round" #1-#3).
#
#   nohup tools/run_queue_r5a.sh <budget_s> &
#
# Serializes on the single chip via a PID lockfile (ADVICE r3: gate on
# process liveness, not log mtime).
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-10800}
START=$(date +%s)
LOG=runs/queue_r5a.log
LOCK=runs/chip.lock

# chip lock: wait while a previous queue's recorded PID is still alive
for _ in $(seq 1 480); do
  if [ -f "$LOCK" ]; then
    pid=$(cat "$LOCK" 2>/dev/null || echo "")
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then sleep 30; continue; fi
  fi
  break
done
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT

echo "=== r5a starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. fused-path roofline floor for the shipped default (bench.py publishes
#    hbm_floor_sec_per_iter; it is None until this lands)
run_job cost_analysis_fused 1800 \
  python tools/cost_analysis.py

# 2. headline bench under the shipped (fused) default — the number the
#    driver will re-record as BENCH_r04
run_job bench_fused 1500 \
  python bench.py

# 3. good64 + lsun128 FUSE_MEANPOOL chip A/B (VERDICT #2; base arms are
#    pinned unfused inside bench_all, _mpf arms forced fused); also
#    re-records both base step times under the bf16+Pallas defaults
run_job mpf_ab_good64_lsun 6000 \
  python tools/bench_all.py \
    --workloads good64,good64_mpf,lsun128,lsun128_mpf \
    --lsun_remat off --iters 5

# 4. finish the MNIST-SSL 300-epoch schedule (VERDICT #3; resumes from
#    runs/ssl_mnist_full/ssl_state.npz at epoch 57; ~2 s/epoch)
run_job ssl_mnist_finish 2400 \
  python -m ctgan_tpu.apps.ct_mnist_ssl --epochs 300 --epoch_scan true \
    --out_dir runs/ssl_mnist_full

echo "=== r5a queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
