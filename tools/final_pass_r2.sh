#!/bin/bash
# Final round-2 TPU measurement pass with the corrected (device-accumulator)
# timing: flagship bench, fused-upsample A/B, and the bench_all rows the
# all-in-one process lost (lsun128 in its own process to dodge the
# cross-workload tracer leak, io64 re-measured).
set -u
cd "$(dirname "$0")/.."
LOG=runs/final_pass_r2.log
echo "=== bench.py (accumulator timing) $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1800 python bench.py >> "$LOG" 2>&1
echo "=== ab_fused_upsample $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1200 python tools/ab_fused_upsample.py >> "$LOG" 2>&1
echo "=== bench_all core rows $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1500 python tools/bench_all.py --workloads mnist,cifar,resnet,good64 --iters 10 >> "$LOG" 2>&1
echo "=== bench_all lsun128 (own process) $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1200 python tools/bench_all.py --workloads lsun128 --iters 10 >> "$LOG" 2>&1
echo "=== bench_all io64 (own process) $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1200 python tools/bench_all.py --workloads io64 --iters 10 >> "$LOG" 2>&1
echo "=== final pass complete $(date -u +%FT%TZ) ===" >> "$LOG"
