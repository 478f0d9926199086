#!/bin/bash
# At-schedule flagship run with crash/resume supervision.
# The train loop checkpoints every --save_every iters and resumes from the
# latest checkpoint on restart (the designed tunnel-hiccup failure mode).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/flagship_r2}
ITERS=${2:-100000}
for attempt in $(seq 1 20); do
  echo "=== attempt $attempt $(date -u +%FT%TZ) ===" >> "$OUT.supervisor.log"
  timeout 14400 python -m ctgan_tpu.apps.ct_gan_cifar_resnet \
    --out_dir "$OUT" --ITERS "$ITERS" --save_every 1000 \
    >> "$OUT.log" 2>&1
  rc=$?
  echo "=== attempt $attempt exited rc=$rc $(date -u +%FT%TZ) ===" >> "$OUT.supervisor.log"
  if [ $rc -eq 0 ]; then
    echo "=== run complete ===" >> "$OUT.supervisor.log"
    exit 0
  fi
  sleep 30
done
echo "=== giving up after 20 attempts ===" >> "$OUT.supervisor.log"
exit 1
