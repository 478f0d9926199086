#!/bin/bash
# Round-3 session-5 chip queue.  Resumes run_queue_r4d.sh, which died with
# the session mid-way through the third risky layout arm (dot_grouping —
# no result line, so it re-runs here).  Completed in r4d and NOT repeated:
# copy_fusion_split (13142.9 img/s), latch_rhs (13201.3) — both below the
# adopted base, consistent with the whole sweep.
#
# Reordered for a ~1 h session: the FUSE_MEANPOOL flagship A/B is the top
# ROADMAP #2 lever and runs first; the two missing cost accounts are cheap
# and close the "every workload has a roofline account" goal; the risky
# arms and the MNIST-SSL 300-epoch schedule fill the remainder.
#
#   nohup tools/run_queue_r4e.sh <budget_s> &
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-3300}
START=$(date +%s)
LOG=runs/queue_r4e.log

echo "=== r4e starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. fused conv+mean_pool flagship A/B (blocks.FUSE_MEANPOOL_CONV):
#    base re-measured in the same process for a clean pair
run_job bench_resnet_mpf 2200 \
  python tools/bench_all.py --workloads resnet,resnet_mpf --iters 10

# 2. the last two workloads without a roofline account
run_job cost_mnist 700 \
  python tools/cost_analysis.py --workload mnist --sec_per_iter 0.0015
run_job cost_cifar 700 \
  python tools/cost_analysis.py --workload cifar --sec_per_iter 0.0099

# 3. mechanism confirm for the mpf win (if any): broadcast/reduce HBM
#    categories must fall in the optimized HLO
run_job hlo_resnet_mpf 1500 \
  env CTGAN_FUSE_MEANPOOL=1 python tools/hlo_breakdown.py --workload resnet \
    --top 15 --dump runs/hlo_resnet_mpf.txt.gz

# 4. the three risky solo flags r4d never finished
for arm in dot_grouping dot_after_layout copy_elision_budget; do
  run_job "layout_risky_$arm" 650 \
    python tools/layout_ab.py --iters 10 --arms "$arm"
done

# 5. adopt pass over the union of every sweep log so far
run_job adopt_layout2 900 \
  python tools/adopt_layout_winner.py \
    --log runs/queue_r4b.log,runs/queue_r4d.log,runs/queue_r4e.log --apply

# 6. the reference's full 300-epoch MNIST-SSL schedule (CT_MNIST.py:141);
#    epoch-scan resume makes a timeout harmless
run_job ssl_mnist_full 2400 \
  python -m ctgan_tpu.apps.ct_mnist_ssl --epochs 300 --epoch_scan true \
    --out_dir runs/ssl_mnist_full

# 7. pre-validate the driver bench
run_job bench_final 1200 python bench.py

echo "=== r4e queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
