"""tools/chiplock.sh: atomic shell-side chip-lock acquisition.

The queue scripts serialize the single tunneled chip on runs/chip.lock.
The historical pattern (poll until free, sleep, `echo $$ > lock`) let two
concurrent waiters both claim the same free window — observed in practice
as two run_queue_r5d.sh instances both proceeding.  chiplock.sh closes
this with a noclobber create, a rename-based stale reap, and a post-claim
ownership confirm (bench.py may take the lock over before preempting its
holder; see bench._acquire_chip_lock).
"""

import os
import subprocess
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HELPER = os.path.join(REPO, "tools", "chiplock.sh")

CONTENDER = """
source "$1"
chiplock_acquire "$2" "${5:-400}" || exit 9
echo "enter $$" >> "$3"
sleep "$4"
echo "exit $$" >> "$3"
chiplock_release "$2"
"""


def _spawn(lock, events, hold="0.3", env=None, max_polls="400"):
    full = dict(os.environ, CHIPLOCK_POLL="0.1", CHIPLOCK_SETTLE="0.2")
    full.update(env or {})
    return subprocess.Popen(
        ["bash", "-c", CONTENDER, "contender", HELPER, lock, events, hold,
         max_polls],
        env=full,
    )


def test_mutual_exclusion_under_contention(tmp_path):
    lock = str(tmp_path / "chip.lock")
    events = str(tmp_path / "events")
    procs = [_spawn(lock, events) for _ in range(6)]
    for p in procs:
        assert p.wait(timeout=120) == 0
    lines = open(events).read().split()
    # Expect strict enter/exit alternation with matching PIDs: no two
    # holders ever overlapped.
    assert len(lines) == 6 * 4
    it = iter(zip(lines[::2], lines[1::2]))
    for _ in range(6):
        tag, pid = next(it)
        assert tag == "enter"
        tag2, pid2 = next(it)
        assert tag2 == "exit" and pid2 == pid
    assert not os.path.exists(lock)


def test_stale_lock_is_reaped(tmp_path):
    lock = str(tmp_path / "chip.lock")
    events = str(tmp_path / "events")
    dead = subprocess.Popen(["true"])
    dead.wait()
    with open(lock, "w") as f:
        f.write(str(dead.pid))
    p = _spawn(lock, events)
    assert p.wait(timeout=60) == 0
    assert open(events).read().count("enter") == 1
    assert not os.path.exists(lock)


def test_release_respects_foreign_holder(tmp_path):
    lock = str(tmp_path / "chip.lock")
    with open(lock, "w") as f:
        f.write("12345")
    rc = subprocess.run(
        ["bash", "-c", f'source "{HELPER}"; chiplock_release "{lock}"'],
    ).returncode
    assert rc == 0
    assert os.path.exists(lock)  # not ours -> untouched


def test_takeover_during_settle_backs_off(tmp_path):
    """bench.py may overwrite the lock with its own PID right after a queue
    claims it (takeover-then-preempt).  The claimant must notice it lost
    ownership during the settle window and NOT proceed."""
    lock = str(tmp_path / "chip.lock")
    events = str(tmp_path / "events")
    # Settle long enough for us to intervene; low max_polls so the backed-off
    # contender gives up (the takeover PID — ours — stays alive) and exits 9.
    p = _spawn(lock, events, env={"CHIPLOCK_SETTLE": "2"}, max_polls="5")
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            if open(lock).read().strip():
                break
        except OSError:
            pass
        time.sleep(0.02)
    else:
        pytest.fail("contender never claimed the lock")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))  # live takeover PID
    assert p.wait(timeout=60) == 9
    assert not os.path.exists(events)
    assert open(lock).read().strip() == str(os.getpid())
