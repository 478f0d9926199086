#!/bin/bash
# Durability committer (round 5, leg j).  The round-4 and round-5 VM resets
# both wiped untracked run state (ssl_state.npz at epoch 823 the second
# time) — git-tracked files are the ONLY artifacts that survive a leg
# boundary.  So: periodically commit the SMALL resume-critical artifacts of
# the live schedules.  Heavy state (ssl_state.npz ~160MB, ckpt_N.npz) stays
# untracked; the approximate-resume path (utils/resume.py) reconstructs
# from exactly what this script banks: params + log.pkl.
#
#   tools/commit_progress.sh [--with-params]
#
# Logs/pngs are committed every call; the ~43MB SSL param trio only when
# --with-params is given (the queue passes it on alternate sweeps to bound
# repo growth).  Uses `git commit -- <paths>` so a concurrently staged
# index (the interactive session commits too) is never swept in.
set -u
cd "$(dirname "$0")/.."

WITH_PARAMS=0
[ "${1:-}" = "--with-params" ] && WITH_PARAMS=1

paths=()
add() { for f in "$@"; do [ -e "$f" ] && paths+=("$f"); done; return 0; }

add runs/queue_r5j.log runs/ssl_te_r5.log runs/good64_r5.log runs/lsun128_r5.log
add runs/ssl_te_r5/log.pkl runs/ssl_te_r5/log.ndjson
for d in runs/good64_r5 runs/lsun128_r5; do
  add "$d"/log.pkl "$d"/log.ndjson "$d"/params_latest.npz
  # newest 2 sample grids only — the curve + latest visual is the evidence
  for png in $(ls -t "$d"/samples_*.png 2>/dev/null | head -2); do add "$png"; done
done
if [ "$WITH_PARAMS" = 1 ]; then
  add runs/ssl_te_r5/disc_params.npz runs/ssl_te_r5/gen_params.npz \
      runs/ssl_te_r5/avg_params.npz
fi

[ "${#paths[@]}" -eq 0 ] && exit 0
if git diff --quiet HEAD -- "${paths[@]}" 2>/dev/null \
   && ! git ls-files --others --exclude-standard -- "${paths[@]}" | grep -q .; then
  exit 0  # nothing changed
fi

# Refuse to bank a torn log.pkl: the live writer may still rewrite it
# non-atomically (pre-fix processes), and a banked half-pickle would read
# back as "no progress" after a wipe — the exact loss this tool prevents.
# "?" (unreadable) => retry next sweep with logs-only would still be torn,
# so skip the whole sweep and let the next one pick up a whole file.
epoch=$(python - <<'EOF' 2>/dev/null
import pickle
try:
    log = pickle.load(open("runs/ssl_te_r5/log.pkl", "rb"))
    print(max(max(s) for s in log.values() if s))
except FileNotFoundError:
    print("-")
except Exception:
    print("?")
EOF
)
if [ "$epoch" = "?" ]; then
  echo "commit_progress: SKIPPED — runs/ssl_te_r5/log.pkl unreadable (torn write?) $(date -u +%FT%TZ)"
  exit 0
fi
git add -- "${paths[@]}" || { echo "commit_progress: FAILED git add rc=$? $(date -u +%FT%TZ)"; exit 1; }
if git commit -q -m "progress: TE epoch ${epoch} + depth-run artifacts (durability sweep)" \
     -- "${paths[@]}"; then
  echo "commit_progress: banked TE epoch ${epoch} ($(date -u +%FT%TZ), with_params=$WITH_PARAMS)"
else
  echo "commit_progress: FAILED git commit rc=$? (index lock held?) $(date -u +%FT%TZ)"
  exit 1
fi
