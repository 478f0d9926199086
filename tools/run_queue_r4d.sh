#!/bin/bash
# Round-3 session-4 reprioritized chip queue.  Supersedes the tail of
# run_queue_r4b.sh (supervisor stopped after the first risky arm; this
# script waits for the orphaned arm to finish by watching the shared log
# go quiet) and folds in run_tail_r4b.sh + run_tail_r4c.sh, reordered so
# every cheap high-value measurement runs BEFORE the multi-hour training
# legs:
#
#   1. remaining risky layout arms  — crash-isolated solos (650 s each)
#   2. adopt pass 2                 — in case a risky arm wins
#   3. FUSE_MEANPOOL flagship A/B   — the new exact stride-2 rewrite
#      (bench arms resnet/resnet_mpf/resnet_mpf_fuc) + confirming HLO dump
#   4. hlo_breakdown good64         — ROADMAP #4, timed out twice before
#   5. FUSE_MEANPOOL good64 A/B     — same lever at 9x the absolute step
#   6. mnist/cifar cost accounts    — the last two workloads without one
#   7. ssl_mnist 300-epoch schedule — completes CT_MNIST.py's reference run
#   8. ssl_cifar 1000-epoch         — the full CT_CIFAR.py schedule
#   9. bench final + lsun128 fresh leg
#
#   nohup tools/run_queue_r4d.sh <budget_s> &
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-39600}
START=$(date +%s)
LOG=runs/queue_r4d.log

# Wait for the orphaned r4b arm: its stdout still appends to
# runs/queue_r4b.log through the inherited fd, so quiescence (no writes
# for 150 s) + the 650 s arm timeout bounds the wait.
echo "=== r4d waiting for orphaned r4b arm $(date -u +%FT%TZ) ===" >> "$LOG"
for _ in $(seq 1 60); do
  age=$(( $(date +%s) - $(stat -c %Y runs/queue_r4b.log) ))
  [ "$age" -ge 150 ] && break
  sleep 30
done
echo "=== chip assumed free; r4d starting $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. remaining never-measured risky solo flags (large_2nd_minor ran as the
# orphan; adopt dedups by arm label across BOTH logs)
for arm in copy_fusion_split latch_rhs dot_grouping dot_after_layout \
           copy_elision_budget; do
  run_job "layout_risky_$arm" 650 \
    python tools/layout_ab.py --iters 10 --arms "$arm"
done

# 2. adopt pass 2 over the union of this session's sweep logs
run_job adopt_layout2 900 \
  python tools/adopt_layout_winner.py --log runs/queue_r4b.log,runs/queue_r4d.log --apply

# 3. fused conv+mean_pool flagship A/B + mechanism confirm
run_job bench_resnet_mpf 2700 \
  python tools/bench_all.py --workloads resnet,resnet_mpf --iters 10
run_job hlo_resnet_mpf 1800 \
  env CTGAN_FUSE_MEANPOOL=1 python tools/hlo_breakdown.py --workload resnet \
    --top 15 --dump runs/hlo_resnet_mpf.txt.gz

# 4. good64 byte attribution (compile alone ~500-1100 s on the tunnel)
run_job hlo_breakdown_good64 4200 \
  python tools/hlo_breakdown.py --workload good64 --top 20 \
    --dump runs/hlo_good64_r4.txt.gz

# 5. the same lever on good64 (two ~500-1100 s compiles)
run_job bench_good64_mpf 4200 \
  python tools/bench_all.py --workloads good64,good64_mpf --iters 5

# 6. the last two workloads without a roofline account
run_job cost_mnist 900 \
  python tools/cost_analysis.py --workload mnist --sec_per_iter 0.0015
run_job cost_cifar 900 \
  python tools/cost_analysis.py --workload cifar --sec_per_iter 0.0099

# 7. the reference's full 300-epoch MNIST-SSL schedule (CT_MNIST.py:141)
run_job ssl_mnist_full 2700 \
  python -m ctgan_tpu.apps.ct_mnist_ssl --epochs 300 --epoch_scan true \
    --out_dir runs/ssl_mnist_full

# 8. the complete reference schedule, CT_CIFAR.py:175 = 1000 epochs
run_training ssl_cifar_full 21600 runs/ssl_cifar_full.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_full

# 9. pre-validate the driver bench, then spend the remainder on lsun128
run_job bench_final 1500 python bench.py

run_training lsun128_fresh 10800 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r4 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
