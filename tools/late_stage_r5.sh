#!/bin/bash
# r5g late-stage hook: spend the queue's final window finishing the TE
# 1000-epoch schedule (CT_CIFAR-10_TE.py:300-309).  The 14400s ssl_te_close
# leg resumes at epoch 500 and covers ~250 epochs; this hook (and any
# follow-on r5h queue) drives the remainder.  Runs inside the queue process
# — the chip lock is already held; do NOT re-acquire.
#
# Same contract as run_queue_r5g.sh's run_training: a continuation attempt
# that trains without printing a "resumed" line is an incident, not a run —
# abort instead of overwriting history.
set -u
cd "$(dirname "$0")/.."
TLOG=runs/ssl_te_r5.log

off=$(wc -l < "$TLOG" 2>/dev/null || echo 0)
echo "late_stage_r5: continuing ssl_te toward epoch 1000 $(date -u +%FT%TZ)"
timeout 3300 python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
  --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5 >> "$TLOG" 2>&1
rc=$?
slice=$(tail -n +"$(( off + 1 ))" "$TLOG" 2>/dev/null)
resumed=$(printf '%s' "$slice" | grep -m1 "resumed" || true)
echo "late_stage_r5: rc=$rc resumed='${resumed:0:90}' $(date -u +%FT%TZ)"
if [ -z "$resumed" ] && printf '%s' "$slice" | grep -q "^iter "; then
  echo "!!! QUEUE_ASSERT_FAIL late_stage_r5: trained without a 'resumed' line"
fi
