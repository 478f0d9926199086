#!/bin/bash
# Round-5 leg-k queue: depth runs after the TE close, replacing r5j's
# remaining legs (r5j is preempted once TE finishes — editing a RUNNING
# bash script corrupts its read offsets, so fixes land here instead).
#
# Fix vs r5j's run_training (code-review finding): a retry attempt only
# EXPECTS a "resumed" line when the job's out_dir actually shows logged
# progress — attempt 1 dying during its startup compile (before the first
# log flush) legitimately leaves nothing to resume, and the old assert
# would have aborted the whole leg on the correct fresh restart.
#
#   nohup tools/run_queue_r5k.sh <budget_s> [te_first] &
#
# te_first=1 prepends a TE continuation leg (for the case r5j cut the TE
# schedule at its own budget boundary before epoch 1000).
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-7200}
TE_FIRST=${2:-0}
LOG=runs/queue_r5k.log
LOCK=runs/chip.lock

source tools/chiplock.sh
chiplock_acquire "$LOCK" || exit 1
COMMIT_PID=
trap 'chiplock_release "$LOCK"; [ -n "$COMMIT_PID" ] && kill "$COMMIT_PID" 2>/dev/null' EXIT

START=$(date +%s)
echo "=== r5k starting (budget ${BUDGET}s, te_first=$TE_FIRST) $(date -u +%FT%TZ) ===" >> "$LOG"

remaining() { echo $(( BUDGET - ($(date +%s) - START) )); }

( sweep=0
  while true; do
    sleep 1200
    sweep=$(( sweep + 1 ))
    if [ $(( sweep % 2 )) -eq 0 ]; then
      tools/commit_progress.sh --with-params >> "$LOG" 2>&1
    else
      tools/commit_progress.sh >> "$LOG" 2>&1
    fi
  done
) & COMMIT_PID=$!

has_progress() {  # has_progress <out_dir> -> 0 if log.pkl shows any epochs/iters
  python - "$1" <<'EOF'
import pickle, sys
try:
    log = pickle.load(open(sys.argv[1] + "/log.pkl", "rb"))
    ok = any(s for s in log.values())
except Exception:
    ok = False
sys.exit(0 if ok else 1)
EOF
}

# run_training <name> <max_secs> <tlog> <out_dir> <expect_resume_first:0|1> <cmd...>
run_training() {
  local name=$1 max=$2 tlog=$3 odir=$4 expect_first=$5; shift 5
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
    local expect
    if [ "$attempt" -eq 1 ]; then
      expect=$expect_first
    elif has_progress "$odir"; then
      expect=1    # there IS something to resume — silent fresh start = incident
    else
      expect=0    # attempt 1 died before any progress; fresh restart is correct
    fi
    local off; off=$(wc -l < "$tlog" 2>/dev/null || echo 0)
    echo "--- $name attempt $attempt (${t}s left, expect_resume=$expect) $(date -u +%FT%TZ)" >> "$LOG"
    timeout "$t" "$@" >> "$tlog" 2>&1
    local rc=$?
    local slice; slice=$(tail -n +"$(( off + 1 ))" "$tlog" 2>/dev/null)
    local resumed; resumed=$(printf '%s' "$slice" | grep -m1 "resumed" || true)
    echo "--- $name attempt $attempt rc=$rc resumed='${resumed:0:90}' $(date -u +%FT%TZ)" >> "$LOG"
    if [ "$expect" -eq 1 ] && [ -z "$resumed" ] \
       && printf '%s' "$slice" | grep -q "^iter "; then
      echo "!!! QUEUE_ASSERT_FAIL $name: attempt $attempt trained without a 'resumed' line — aborting leg" >> "$LOG"
      break
    fi
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 124 ] && break
    attempt=$(( attempt + 1 ))
    [ "$attempt" -gt 12 ] && break
    sleep 30
  done
}

if [ "$TE_FIRST" = "1" ]; then
  run_training ssl_te_tail 5400 runs/ssl_te_r5.log runs/ssl_te_r5 1 \
    python -m ctgan_tpu.apps.ct_cifar_ssl --temporal_ensembling true \
      --epochs 1000 --epoch_scan true --out_dir runs/ssl_te_r5
  tools/commit_progress.sh --with-params >> "$LOG" 2>&1
fi

G64_EXPECT=0; has_progress runs/good64_r5 && G64_EXPECT=1
run_training good64_r5 3900 runs/good64_r5.log runs/good64_r5 "$G64_EXPECT" \
  python -m ctgan_tpu.apps.ct_gan_64x64 --out_dir runs/good64_r5 \
    --ITERS 200000 --save_every 1000 --sample_every 1000 \
    --inception_every 4000 --inception_samples 1000

L128_EXPECT=0; has_progress runs/lsun128_r5 && L128_EXPECT=1
run_training lsun128_r5 14400 runs/lsun128_r5.log runs/lsun128_r5 "$L128_EXPECT" \
  python -m ctgan_tpu.apps.wgan_lsun128 --out_dir runs/lsun128_r5 \
    --ITERS 200000 --save_every 500 --sample_every 1000

tools/commit_progress.sh --with-params >> "$LOG" 2>&1
echo "=== r5k queue complete $(date -u +%FT%TZ) ===" >> "$LOG"
