"""tools/queue_preempt.py — chip-lock takeover + process-tree preemption.

The queue scripts' preemption path (same contract as bench.py's round-end
takeover: claim the lock by overwriting the holder's PID, kill the
holder's transitive tree via /proc walks, then free the lock for the
caller's chiplock_acquire).  No reference analogue — the reference has no
shared-device arbitration at all; this is the repo's own runtime story.
"""

import os
import subprocess
import sys
import time

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "queue_preempt.py")


def _run(args):
    return subprocess.run([sys.executable, TOOL, *args],
                          capture_output=True, text=True, timeout=60)


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def test_stale_lock_is_reaped(tmp_path):
    lock = tmp_path / "chip.lock"
    lock.write_text("99999999")  # beyond pid_max defaults: never alive
    r = _run([str(lock)])
    assert r.returncode == 0
    assert not lock.exists()


def test_missing_lock_is_noop(tmp_path):
    lock = tmp_path / "chip.lock"
    r = _run([str(lock)])
    assert r.returncode == 0
    assert not lock.exists()


def test_live_holder_tree_is_killed_and_lock_freed(tmp_path):
    lock = tmp_path / "chip.lock"
    # A holder with a child: bash parent spawning a long sleep, like a
    # queue runner wrapping timeout+python.
    holder = subprocess.Popen(
        ["bash", "-c", "sleep 300 & wait"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        time.sleep(0.3)  # let the child sleep spawn
        with open(f"/proc/{holder.pid}/task/{holder.pid}/children") as f:
            kids = [int(c) for c in f.read().split()]
        assert kids, "holder never spawned its child"
        lock.write_text(str(holder.pid))

        r = _run([str(lock), str(holder.pid)])
        assert r.returncode == 0, r.stderr
        assert "preempting holder" in r.stderr

        holder.wait(timeout=10)
        deadline = time.time() + 10
        while time.time() < deadline and any(_alive(k) for k in kids):
            time.sleep(0.1)
        assert not any(_alive(k) for k in kids), "child survived preemption"
        # Lock freed for the caller's chiplock_acquire.
        assert not lock.exists()
    finally:
        if holder.poll() is None:
            holder.kill()
