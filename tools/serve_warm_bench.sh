#!/bin/bash
# Warm-cache serving cold-start measurement (VERDICT r4 item 3).
#
# Round 4 measured the flagship serve bench paying 1194 s (bf16) / 394 s
# (fp32) of compile in its FIRST process.  The persistent compilation cache
# (utils/compile_cache.py) wrote those executables to ~/.cache/ctgan_tpu/xla
# — this script reruns the byte-identical serve programs in FRESH processes
# and records what a warm-cache cold start actually costs (expected:
# deserialization, seconds not minutes).  Run by the r5g queue's mid-queue
# hook, under the chip lock.
set -u
cd "$(dirname "$0")/.."
OUT=runs/serve_warm_r5.log
FLAG_CKPT=$(ls -v runs/flagship_fused_r4/ckpt/ckpt_*.npz 2>/dev/null | tail -1)

echo "=== serve_warm_bench $(date -u +%FT%TZ) cache=$(du -sh ~/.cache/ctgan_tpu/xla 2>/dev/null | cut -f1) ===" >> "$OUT"
for BF in true false; do
  echo "--- flagship bf16=$BF fresh-process warm-cache run $(date -u +%FT%TZ)" >> "$OUT"
  timeout 1500 python -m ctgan_tpu.apps.generate --model cifar_resnet \
    --ckpt "$FLAG_CKPT" --batch 1024 --serve_iters 50 --bf16 "$BF" >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%FT%TZ)" >> "$OUT"
done

# AOT artifact story (utils/aot.py): build the shippable executable once
# (warm cache should make this cheap), then a FRESH process serves from it
# with zero XLA involvement — the true production cold start.
AOT=runs/flagship_b1024_bf16.jaxexec
echo "--- flagship bf16 --aot_save $(date -u +%FT%TZ)" >> "$OUT"
timeout 1500 python -m ctgan_tpu.apps.generate --model cifar_resnet \
  --ckpt "$FLAG_CKPT" --batch 1024 --bf16 true --aot_save "$AOT" >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%FT%TZ)" >> "$OUT"
echo "--- flagship bf16 --aot fresh-process zero-compile serve $(date -u +%FT%TZ)" >> "$OUT"
timeout 600 python -m ctgan_tpu.apps.generate --model cifar_resnet \
  --ckpt "$FLAG_CKPT" --batch 1024 --bf16 true --aot "$AOT" \
  --serve_iters 50 >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%FT%TZ)" >> "$OUT"
echo "=== serve_warm_bench done $(date -u +%FT%TZ) ===" >> "$OUT"
