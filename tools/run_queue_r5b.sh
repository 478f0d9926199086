#!/bin/bash
# Round-4 stage-B queue: the long chip legs, in VERDICT-r3 priority order.
#
#   nohup tools/run_queue_r5b.sh <budget_s> &
#
# Serializes on runs/chip.lock (PID liveness — ADVICE r3) so it waits for
# run_queue_r5a.sh.  Every job is either a pure measurement or a
# crash/resumable training leg; timeouts are harmless.
#
#   1. flagship fused at-schedule leg — VERDICT #1's missing half: quality
#      parity evidence for the now-shipped FUSE_MEANPOOL default (the bf16
#      numerics shift, Weak #2)
#   2. layout sweep completion ON THE SHIPPED (fused) program — safe arms
#      in one process, the two never-measured risky arms crash-isolated
#      with the >=1800 s budgets ROADMAP flagged (650 s was all compile)
#   3. adopt pass over the fused-basis log
#   4. bf16 optimizer-state A/B under the shipped config (VERDICT #7)
#   5. good64 HLO byte attribution (ROADMAP #4; needs >=3000 s)
#   6. CIFAR-SSL 1000-epoch schedule (fresh: the r3 ssl_state.npz did not
#      survive the round boundary), TE continuation, good64/lsun128 fresh
#      200k legs under the round-4 defaults — eat whatever budget remains.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-28800}
START=$(date +%s)
LOG=runs/queue_r5b.log
LOCK=runs/chip.lock

for _ in $(seq 1 480); do
  if [ -f "$LOCK" ]; then
    pid=$(cat "$LOCK" 2>/dev/null || echo "")
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then sleep 30; continue; fi
  fi
  break
done
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT

echo "=== r5b starting (budget ${BUDGET}s) $(date -u +%FT%TZ) ===" >> "$LOG"

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

# 1. flagship at-schedule leg under the SHIPPED defaults (fused mean-pool,
#    bf16, Pallas dropout, adopted layout flag).  TrainedScorer saturated at
#    ~21k iters on the r2 unfused curve; 25k iters at ~17 ms/iter is ~7 min
#    of step time + scorer evals.  Quality parity vs the r2 curve is the
#    deliverable (VERDICT Weak #2).
run_training flagship_fused_schedule 7200 runs/flagship_fused_r4.log \
  python -m ctgan_tpu.apps.ct_gan_cifar_resnet \
    --out_dir runs/flagship_fused_r4 --ITERS 25000 --save_every 1000

# 2a. layout sweep, fused basis, safe arms in one process: fresh base (the
#     program changed — the old 23.9 ms arms were unfused), the adopted
#     winner re-validated, the two ~23.9 ms solos, and the stacked combo
#     VERDICT Weak #4 singles out.
run_job layout_fused_safe 3600 \
  python tools/layout_ab.py --iters 10 \
    --arms base,layout_hints_off,copy_elision_budget,h_copy_elision,h_untiled

# 2b. the two never-measured risky solos, crash-isolated, with budgets that
#     cover a worst-case compile (rc=124 at 650 s twice before).
for arm in dot_grouping dot_after_layout; do
  run_job "layout_fused_risky_$arm" 1800 \
    python tools/layout_ab.py --iters 10 --arms "$arm"
done

# 3. adopt pass over the fused-basis results (pick_winner needs base in the
#    same log; runs/queue_r5b.log has all arms above)
run_job adopt_layout_fused 300 \
  python tools/adopt_layout_winner.py --log runs/queue_r5b.log

# 4. bf16 optimizer-state residency A/B under the shipped fused config
#    (VERDICT #7: stopwatch first; adoption additionally needs an
#    at-schedule equivalence run)
run_job bf16opt_ab 2400 \
  python tools/bench_all.py --workloads resnet_bf16opt_ab --iters 10

# 5. good64 byte attribution (ROADMAP #4) — compile alone ~500-1100 s
run_job hlo_breakdown_good64 4200 \
  python tools/hlo_breakdown.py --workload good64 --top 20 \
    --dump runs/hlo_good64_r4.txt.gz

# 6. long training legs eat the rest of the budget, cheapest-to-close first
run_training ssl_cifar_full 7200 runs/ssl_cifar_full.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_full
run_training ssl_te_continue 4800 runs/ssl_te_r5.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
    --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5
run_training good64_fresh 7200 runs/good64_r4.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r4 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000
run_training lsun128_fresh 7200 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r4 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== r5b queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
