#!/usr/bin/env python
"""Take over the chip lock and preempt the holding queue's process tree.

Same takeover contract as ``bench.py`` (bench.py:126-153): write our own
PID over the holder's first — so a waiter polling ``chiplock_acquire``
never sees a free window while the holder is dying — then TERM→KILL the
holder's transitive subtree (exact PIDs walked via /proc, never name
matching), and finally remove the lock so the CALLER's normal
``chiplock_acquire`` claims it cleanly.

Every queue leg checkpoints by contract (tools/run_queue_r5g.sh header),
so preemption costs at most one save interval of the running leg.

Usage: python tools/queue_preempt.py <lockfile> [holder_pid]
  exits 0 if the holder is gone (or was already gone), 1 on timeout.
"""

from __future__ import annotations

import os
import signal
import sys
import time


def _pid_alive(pid: int) -> bool:
    try:
        with open(f"/proc/{pid}/stat") as f:
            stat = f.read()
        return stat.rsplit(")", 1)[1].split()[0] != "Z"
    except (OSError, IndexError):
        return False


def _descendants(pid: int) -> list[int]:
    out, frontier = [], [pid]
    while frontier:
        p = frontier.pop()
        try:
            tasks = os.listdir(f"/proc/{p}/task")
        except OSError:
            continue
        for t in tasks:
            try:
                with open(f"/proc/{p}/task/{t}/children") as f:
                    kids = [int(c) for c in f.read().split()]
            except (OSError, ValueError):
                continue
            out.extend(kids)
            frontier.extend(kids)
    return out


def main(argv: list[str]) -> int:
    lock = argv[1]
    holder: int | None = None
    if len(argv) > 2:
        holder = int(argv[2])
    else:
        try:
            with open(lock) as f:
                holder = int(f.read().strip())
        except (OSError, ValueError):
            holder = None
    if holder is None or not _pid_alive(holder):
        print(f"queue_preempt: no live holder for {lock}; nothing to do",
              file=sys.stderr)
        try:
            os.remove(lock)
        except OSError:
            pass
        return 0

    # Takeover: claim the lock before killing so no third party races in.
    with open(lock, "w") as f:
        f.write(str(os.getpid()))

    tree = [holder] + _descendants(holder)
    print(f"queue_preempt: preempting holder {holder} (tree {tree})",
          file=sys.stderr, flush=True)
    for sig, grace in ((signal.SIGTERM, 20.0), (signal.SIGKILL, 3.0)):
        for p in tree:
            try:
                os.kill(p, sig)
            except OSError:
                pass
        deadline = time.time() + grace
        while time.time() < deadline and any(_pid_alive(p) for p in tree):
            time.sleep(0.5)
        tree = [p for p in tree if _pid_alive(p)]
        if not tree:
            break
    if tree:
        print(f"queue_preempt: PIDs survived SIGKILL?! {tree}",
              file=sys.stderr)
        return 1
    # Hand the slot to the caller's chiplock_acquire.
    try:
        if open(lock).read().strip() == str(os.getpid()):
            os.remove(lock)
    except OSError:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
