#!/bin/bash
# Round-3 second-session chip schedule (fresh machine: the gitignored
# checkpoints from the first session are gone, so schedule continuations
# restart; this queue therefore prioritizes work that is NEW evidence):
#
#   1. kernel_checks            — chip sanity + native-bf16 dropout mask
#   2. layout sweep (safe arms) — reproduce base + the adopted winner on
#      this machine, then measure the five loss-matching improvers STACKED
#      on the adopted flag (h_*) plus the model-level NCHW arm the round-4
#      sweep never reached (the original sweep log was not committed, so
#      --combo_from is unusable; the stacked arms supersede it)
#   3. adopt (+HLO confirm)     — re-pick fastest loss-matching arm
#   4. layout sweep (risky arms)— the 7 never-measured solo flags, one
#      subprocess + hard timeout each: round 4's sweep wedged the tunnel on
#      a compiler SIGABRT mid-process, so each unknown arm is isolated
#   5. adopt pass 2             — in case a risky solo arm wins
#   6. hlo_breakdown good64     — ROADMAP #4: timed out twice (compile alone
#      is ~500-1100 s on the tunnel); 4200 s budget
#   7. ssl_cifar FULL SCHEDULE  — the reference's complete 1000-epoch
#      CT_CIFAR.py schedule in one resumable leg (~20.6 s/epoch measured
#      => ~5.7 h); the first complete reference schedule end-to-end
#   8. bench final              — pre-validate what the driver runs
#   9. lsun128 fresh leg        — weakest at-schedule evidence (5.2k iters
#      in round 3); whatever time remains
#
#   nohup tools/run_queue_r4b.sh 39600 &
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-39600}
START=$(date +%s)
LOG=runs/queue_r4b.log

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

run_job kernel_checks 600 \
  python tools/kernel_checks_tpu.py

run_job layout_sweep_safe 5400 \
  python tools/layout_ab.py --iters 10 --arms \
base,layout_hints_off,h_negotiation,h_autotune,h_copy_permute,h_copy_fusion,h_untiled,h_all5,nchw_hint

run_job adopt_layout 1800 \
  python tools/adopt_layout_winner.py --log runs/queue_r4b.log --apply \
    --confirm runs/hlo_resnet_tuned_r4b.txt.gz

# never-measured solo flags, crash-isolated: one subprocess + timeout per
# arm (adopt dedups by arm label across the whole log, so the safe sweep's
# base line anchors these)
for arm in loop_fusion_layout large_2nd_minor copy_fusion_split latch_rhs \
           dot_grouping dot_after_layout copy_elision_budget; do
  run_job "layout_risky_$arm" 650 \
    python tools/layout_ab.py --iters 10 --arms "$arm"
done

run_job adopt_layout2 900 \
  python tools/adopt_layout_winner.py --log runs/queue_r4b.log --apply

run_job hlo_breakdown_good64 4200 \
  python tools/hlo_breakdown.py --workload good64 --top 20 \
    --dump runs/hlo_good64_r4.txt.gz

# the complete reference schedule, CT_CIFAR.py:175 = 1000 epochs
run_training ssl_cifar_full 23400 runs/ssl_cifar_full.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_full

run_job bench_final 1500 python bench.py

run_training lsun128_fresh 10800 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r4 \
    --ITERS 200000 --save_every 500 --sample_every 500

echo "=== queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
