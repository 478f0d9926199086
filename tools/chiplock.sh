# Shared chip-lock helper for queue scripts.  Source this, then:
#
#   source tools/chiplock.sh
#   chiplock_acquire runs/chip.lock          # blocks until owned
#   trap 'chiplock_release runs/chip.lock' EXIT
#
# Contract (shared with bench.py's _acquire_chip_lock):
#   * the lockfile holds the owner's PID; a dead PID means the lock is stale;
#   * bench.py may TAKE OVER the lock (write its own PID over ours) before
#     preempting our process tree at round end — so holders must re-check
#     ownership before removing the file, and chiplock_release does;
#   * acquisition must be atomic between concurrent shell waiters.  The
#     historical `sleep; echo $$ > lock` pattern let two waiters both claim
#     after the same free window (observed 2026-08-19: duplicate r5d queues).
#
# Atomicity here:
#   * a STALE lock (dead PID) is reaped by rename — `mv lock lock.stale.$$`
#     succeeds for exactly one reaper; the loser's mv fails and it re-loops;
#   * the FREE slot is claimed with noclobber `>` — exactly one creator wins;
#   * after claiming, the owner waits CHIPLOCK_SETTLE seconds and confirms
#     the file still holds its PID (bench's takeover-then-preempt writes the
#     file; a holder that lost ownership must back off, not proceed).

CHIPLOCK_POLL=${CHIPLOCK_POLL:-30}      # seconds between liveness polls
CHIPLOCK_SETTLE=${CHIPLOCK_SETTLE:-20}  # post-claim ownership confirm delay

chiplock_acquire() {  # chiplock_acquire <lockfile> [max_polls]
  local lock=$1 max=${2:-2880} i pid
  mkdir -p "$(dirname "$lock")"
  for (( i = 0; i < max; i++ )); do
    pid=$(cat "$lock" 2>/dev/null || true)
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
      sleep "$CHIPLOCK_POLL"; continue
    fi
    if [ -e "$lock" ]; then
      # Stale (dead or unreadable PID): exactly one contender wins the mv.
      mv "$lock" "$lock.stale.$$" 2>/dev/null && rm -f "$lock.stale.$$"
      sleep 1; continue  # re-loop: someone may have claimed meanwhile
    fi
    if ( set -o noclobber; echo $$ > "$lock" ) 2>/dev/null; then
      sleep "$CHIPLOCK_SETTLE"
      if [ "$(cat "$lock" 2>/dev/null)" = "$$" ]; then
        return 0
      fi
      # Lost ownership inside the settle window (bench takeover): back off.
    fi
    sleep 1
  done
  return 1
}

chiplock_release() {  # chiplock_release <lockfile>  (safe in an EXIT trap)
  local lock=$1
  [ "$(cat "$lock" 2>/dev/null)" = "$$" ] && rm -f "$lock"
  return 0
}
