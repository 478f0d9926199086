#!/bin/bash
# Session-3 tail: runs AFTER run_queue_r4b.sh completes (polls its log for
# the completion marker, with a hard wait deadline so a wedged queue cannot
# strand the tail).  Fills the two remaining roofline accounts so EVERY
# workload has a cost model (mnist, cifar-conv — VERDICT r2 "every workload
# as proven as the flagship"), then completes the reference's full 300-epoch
# MNIST-SSL schedule (CT_MNIST.py:141; round 2 stopped at epoch 91).
#
#   nohup tools/run_tail_r4b.sh <wait_secs> <run_secs> &
set -u
cd "$(dirname "$0")/.."
WAIT_BUDGET=${1:-39600}
RUN_BUDGET=${2:-4200}
LOG=runs/tail_r4b.log
START=$(date +%s)

echo "=== tail waiting for queue (max ${WAIT_BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"
while true; do
  grep -q "queue complete" runs/queue_r4b.log 2>/dev/null && break
  [ $(( $(date +%s) - START )) -ge "$WAIT_BUDGET" ] && {
    echo "=== wait deadline; queue still running — aborting tail $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  }
  sleep 60
done
echo "=== queue complete; tail starting $(date -u +%FT%TZ) ===" >> "$LOG"

RSTART=$(date +%s)
remaining() { echo $(( RUN_BUDGET - ($(date +%s) - RSTART) )); }

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

run_job cost_mnist 900 \
  python tools/cost_analysis.py --workload mnist --sec_per_iter 0.0015
run_job cost_cifar 900 \
  python tools/cost_analysis.py --workload cifar --sec_per_iter 0.0099

# full reference schedule (300 epochs), resumable epoch-scan mode
run_job ssl_mnist_full 2400 \
  python -m ctgan_tpu.apps.ct_mnist_ssl --epochs 300 --epoch_scan true \
    --out_dir runs/ssl_mnist_full

echo "=== tail complete $(date -u +%FT%TZ) ===" >> "$LOG"
