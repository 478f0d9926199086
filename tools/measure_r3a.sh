#!/bin/bash
# Round-3 measurement batch A: per-workload roofline accounting (VERDICT #1)
# good64 cost (non-remat + remat) was captured in /tmp/cost_good64.json and
# /tmp/cost_r3a.log before the session crash; this finishes lsun128 and adds
# measured-step A/Bs for remat on/off on both workloads.
set -ux
cd "$(dirname "$0")/.."
LOG=runs/measure_r3a.log
{
echo "=== lsun128 cost $(date -u +%FT%TZ) ==="
timeout 1800 python tools/cost_analysis.py --workload lsun128
echo "=== lsun128 cost remat $(date -u +%FT%TZ) ==="
timeout 1800 python tools/cost_analysis.py --workload lsun128 --remat
echo "=== bench_all good64/lsun128 remat A/B $(date -u +%FT%TZ) ==="
timeout 3600 python tools/bench_all.py --workloads good64,lsun128 --iters 10
echo "=== done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
