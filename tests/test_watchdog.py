"""StepWatchdog: hang detection for chip runs (utils/watchdog.py).

Motivated by a real wedge on hardware (2026-08-19, good64 leg at iter
~26.8k): every thread of the training process asleep with no timeout,
37 minutes of queue budget silently lost.  The watchdog converts that
into exit-code-3-and-retry; the queue's resume contract does the rest.
"""

import subprocess
import sys
import time

from ctgan_tpu.utils.watchdog import EXIT_CODE, StepWatchdog


def test_beats_keep_it_quiet():
    exits = []
    wd = StepWatchdog(deadline=0.4, poll=0.05, _exit=exits.append)
    wd.start()
    try:
        for _ in range(12):
            time.sleep(0.1)
            wd.beat()
    finally:
        wd.stop()
    assert exits == []


def test_fires_after_deadline(capfd):
    exits = []
    wd = StepWatchdog(deadline=0.3, poll=0.05, name="unit", _exit=exits.append)
    wd.start()
    deadline = time.time() + 5
    while not exits and time.time() < deadline:
        time.sleep(0.05)
    wd.stop()
    assert exits == [EXIT_CODE]
    err = capfd.readouterr().err
    assert "StepWatchdog[unit]" in err
    assert "wedged" in err


def test_stop_wins_over_fire():
    exits = []
    wd = StepWatchdog(deadline=0.2, poll=0.05, _exit=exits.append)
    wd.start()
    wd.stop()  # stopped before the deadline can elapse
    time.sleep(0.4)
    assert exits == []


def test_two_phase_first_window_tolerates_compile():
    """Before the first beat (a cold compile) the long first_deadline
    applies; after one beat the short steady deadline takes over."""
    exits = []
    wd = StepWatchdog(deadline=0.2, poll=0.05, first_deadline=10.0,
                      _exit=exits.append)
    wd.start()
    try:
        time.sleep(0.5)          # well past steady deadline, no beat yet
        assert exits == []       # first window still open
        wd.beat()                # "first step done"
        deadline = time.time() + 5
        while not exits and time.time() < deadline:
            time.sleep(0.05)     # now the steady 0.2 s deadline fires
    finally:
        wd.stop()
    assert exits == [EXIT_CODE]


def test_env_defaults_two_phase(monkeypatch):
    monkeypatch.delenv("CTGAN_STEP_TIMEOUT", raising=False)
    monkeypatch.delenv("CTGAN_STEP_TIMEOUT_FIRST", raising=False)
    wd = StepWatchdog.start_from_env(name="defaults")
    try:
        assert wd.deadline == 900.0
        assert wd.first_deadline == 1800.0
    finally:
        wd.stop()
    monkeypatch.setenv("CTGAN_STEP_TIMEOUT", "2400")
    wd = StepWatchdog.start_from_env(name="steady-above-first")
    try:
        # first window never undercuts the steady deadline
        assert wd.first_deadline == 2400.0
    finally:
        wd.stop()


def test_disabled_by_env_is_noop(monkeypatch):
    monkeypatch.setenv("CTGAN_STEP_TIMEOUT", "0")
    wd = StepWatchdog.start_from_env(name="off")
    assert wd._thread is None
    wd.beat()
    wd.stop()  # all safe no-ops


def test_real_process_exit(tmp_path):
    """End to end: a subprocess that arms the watchdog and then hangs must
    die with EXIT_CODE and a thread dump on stderr (what a queue log shows
    after a wedge)."""
    code = (
        "import time\n"
        "from ctgan_tpu.utils.watchdog import StepWatchdog\n"
        "wd = StepWatchdog(deadline=0.5, poll=0.1, name='e2e')\n"
        "wd.start()\n"
        "time.sleep(60)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60,
    )
    assert proc.returncode == EXIT_CODE
    assert "StepWatchdog[e2e]" in proc.stderr
    assert "Thread" in proc.stderr  # faulthandler stack dump present