#!/bin/bash
# Round-2 TPU evidence queue (v2, time-bounded): waits for the flagship run
# to release the chip, then measures and trains the remaining workloads
# sequentially — never two TPU processes at once, and everything bounded so
# the chip is free for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
FLAGSHIP_PID=${1:?usage: run_queue_r2.sh <flagship-supervisor-pid>}
LOG=runs/queue_r2.log
echo "=== queue waiting for flagship (pid $FLAGSHIP_PID) $(date -u +%FT%TZ) ===" >> "$LOG"
while kill -0 "$FLAGSHIP_PID" 2>/dev/null; do sleep 60; done
echo "=== flagship done $(date -u +%FT%TZ) ===" >> "$LOG"
sleep 30

echo "=== kernel checks $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 900 python tools/kernel_checks_tpu.py >> "$LOG" 2>&1

echo "=== bench.py $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1800 python bench.py >> "$LOG" 2>&1

echo "=== fused upsample A/B $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 900 python tools/ab_fused_upsample.py >> "$LOG" 2>&1

echo "=== bench_all $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 2400 python tools/bench_all.py --workloads mnist,cifar,resnet,good64,lsun128,io64 --iters 10 >> "$LOG" 2>&1

echo "=== cost analysis $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 900 python tools/cost_analysis.py >> "$LOG" 2>&1

echo "=== ct_mnist_ssl 300 epochs $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 2700 python -m ctgan_tpu.apps.ct_mnist_ssl --epochs 300 \
  --out_dir runs/ssl_mnist_r2 >> runs/ssl_mnist_r2.log 2>&1
echo "=== ssl_mnist rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"

echo "=== ct_cifar_ssl chunked $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1800 python -m ctgan_tpu.apps.ct_cifar_ssl --epochs 60 --chunk 25 \
  --out_dir runs/ssl_cifar_r2 >> runs/ssl_cifar_r2.log 2>&1
echo "=== ssl_cifar rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"

echo "=== queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
