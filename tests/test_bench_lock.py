"""bench.py chip-lock acquisition: wait / stale-lock / preemption semantics.

The single tunneled chip is exclusive; tools/run_queue_*.sh serialize on
runs/chip.lock (PID liveness).  bench._acquire_chip_lock must (a) claim a
free or stale lock, (b) wait for a live holder, and (c) after
CTGAN_BENCH_LOCK_WAIT seconds preempt the holder's whole process tree so
the driver's end-of-round bench never records a degraded 0.0 artifact
(the holder is a checkpoint/resumable training queue by contract).
"""

import os
import subprocess
import time

import pytest

import bench


@pytest.fixture
def lockfile(tmp_path, monkeypatch):
    path = str(tmp_path / "chip.lock")
    monkeypatch.setattr(bench, "CHIP_LOCK", path)
    return path


def test_acquire_free_lock(lockfile):
    bench._acquire_chip_lock()
    with open(lockfile) as f:
        assert int(f.read()) == os.getpid()
    bench._release_chip_lock()
    assert not os.path.exists(lockfile)


def test_acquire_stale_lock(lockfile):
    # Allocate-and-reap a child so its PID is certainly dead.
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(lockfile, "w") as f:
        f.write(str(proc.pid))
    bench._acquire_chip_lock()
    with open(lockfile) as f:
        assert int(f.read()) == os.getpid()
    bench._release_chip_lock()


def test_acquire_garbage_lock(lockfile):
    with open(lockfile, "w") as f:
        f.write("not-a-pid")
    bench._acquire_chip_lock()
    with open(lockfile) as f:
        assert int(f.read()) == os.getpid()
    bench._release_chip_lock()


def test_release_respects_foreign_holder(lockfile):
    with open(lockfile, "w") as f:
        f.write("12345")
    bench._release_chip_lock()
    assert os.path.exists(lockfile)  # not ours -> untouched


def test_descendants_walks_tree():
    proc = subprocess.Popen(["bash", "-c", "sleep 30 & wait"])
    try:
        deadline = time.time() + 5
        kids = []
        while time.time() < deadline:
            kids = bench._descendants(proc.pid)
            if kids:
                break
            time.sleep(0.05)
        assert kids, "bash child (sleep) never appeared under the holder"
    finally:
        proc.kill()
        proc.wait()


def test_preempts_live_holder_tree(lockfile, monkeypatch):
    monkeypatch.setenv("CTGAN_BENCH_LOCK_WAIT", "0")
    holder = subprocess.Popen(["bash", "-c", "sleep 300 & wait"])
    try:
        deadline = time.time() + 5
        kids = []
        while time.time() < deadline:
            kids = bench._descendants(holder.pid)
            if kids:
                break
            time.sleep(0.05)
        assert kids
        with open(lockfile, "w") as f:
            f.write(str(holder.pid))

        bench._acquire_chip_lock()

        with open(lockfile) as f:
            assert int(f.read()) == os.getpid()
        assert holder.wait(timeout=10) != 0  # reaped, killed by signal
        for k in kids:
            assert not bench._pid_alive(k)
    finally:
        if holder.poll() is None:
            holder.kill()
            holder.wait()
        bench._release_chip_lock()
