#!/bin/bash
# Round-4 chip schedule (priority order, serialized, deadline-bounded).
# Start early in the round:   nohup tools/run_queue_r4.sh 36000 &
# Leave >=1h of round slack for interactive follow-ups + the driver bench.
#
#   1. ssl_cifar_te at-schedule       — VERDICT r2 #3, lost to a tunnel drop
#      in round 3 (runs/ssl_te_r3.log); the only missing at-schedule workload
#   2. layout_ab remaining arms       — the flagship layout-copy lever
#      (VALIDATION r3 "HBM-byte cut": 4.6 GB/iter of layout copies)
#   3. hlo_breakdown good64           — timed out at 1241s in round 3; the
#      good64 compile alone is ~500-600s, give it 3000s
#   4. good64 resume                  — continue the 200k reference schedule
#      from runs/good64_r3/ckpt (iter 24000; IS 6.72 and still climbing)
#   5. lsun128 resume                 — continue from iter 5000
#   6. ssl_cifar resume               — extend past epoch 116, proving the
#      SSL epoch-level resume path on chip
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-36000}
START=$(date +%s)
LOG=runs/queue_r4.log

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

# fast first: validates the chip is really up + the new native-bf16 dropout
# mask (same seed -> same keep pattern as fp32) before the heavy legs
run_job kernel_checks 900 \
  python tools/kernel_checks_tpu.py

# budget-bound: ~200 epochs at the measured 20.6 s/epoch is firmly
# "at schedule, hundreds of epochs" evidence; the run is resumable if a
# later slot wants to extend it
run_training ssl_cifar_te 4200 runs/ssl_te_r4.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --temporal_ensembling true --out_dir runs/ssl_te_r4

# ALL arms: the round-3 tail probe produced nothing — the tunnel wedged
# after the deadline-killed good64 compile (runs/layout_ab_r3.log: 19 min,
# zero arms, rc=124), so no flag has a chip measurement yet
run_job layout_ab 7200 \
  python tools/layout_ab.py --iters 10

# adopt a validated winner (>=2% faster, matching loss) as the committed
# tuned flags + confirm on chip that the layout-copy bytes actually fell
run_job adopt_layout 2400 \
  python tools/adopt_layout_winner.py --log runs/queue_r4.log --apply \
    --confirm runs/hlo_resnet_tuned_r4.txt.gz

# cheap flagship jobs first (compiles ~1 min, cache-warm): bf16 opt-state
# A/B + the post-native-bf16-mask byte model + step re-records
run_job cost_bf16opt 1200 \
  python tools/cost_analysis.py --workload resnet --bf16opt
run_job cost_resnet_postmask 1200 \
  python tools/cost_analysis.py --workload resnet
run_job bench_resnet_ab 2400 \
  python tools/bench_all.py --workloads resnet,resnet_ab --iters 10

# expensive good64 compiles (~500-1100 s each on the tunnel) after the
# cheap flagship batch
run_job hlo_breakdown_good64 3000 \
  python tools/hlo_breakdown.py --workload good64 --top 20 \
    --dump runs/hlo_good64_r4.txt.gz
run_job cost_good64_postmask 3600 \
  python tools/cost_analysis.py --workload good64
# (good64's post-change step time comes free from the resume leg's logs —
# its 500-1100 s compile is too dear to spend on a bench duplicate)
run_job bench_lsun_postmask 2400 \
  python tools/bench_all.py --workloads lsun128 --iters 5 --lsun_remat off

run_training good64_resume 14400 runs/good64_r4.log \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r3 \
    --ITERS 200000 --save_every 1000 --sample_every 500 \
    --inception_every 2000 --inception_samples 1000

run_training lsun128_resume 7200 runs/lsun128_r4.log \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r3 \
    --ITERS 200000 --save_every 500 --sample_every 500

run_training ssl_cifar_resume 3600 runs/ssl_cifar_r4.log \
  python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 1000 --epoch_scan true \
    --out_dir runs/ssl_cifar_r3

echo "=== queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
