"""Hang detection for chip training runs (SURVEY §5 failure detection).

The tunneled TPU runtime can wedge mid-call: every thread asleep on a futex
or the tunnel socket, 0% CPU, no timeout, forever.  Observed on hardware
2026-08-19 (good64 leg, iter ~26.8k): the run went silent and burned 37
minutes of queue budget before the leg's outer ``timeout`` killed it.  A
wedged XLA call cannot be interrupted from Python — no exception will ever
surface — so the only reliable recovery is process death: the queue runner
sees a nonzero exit, retries the leg, and the loop resumes from its last
checkpoint (crash/resume is exact by contract, tests/test_apps.py).

``StepWatchdog`` runs a daemon thread that checks a progress beat.  The
training loop calls ``beat()`` once per step (or once per epoch in the
SSL epoch-scan mode); if no beat lands for ``deadline`` seconds the thread
dumps every Python thread's stack to stderr (so the wedged frame is visible
in the leg's log) and ``os._exit``\\ s with ``EXIT_CODE``.

Deadline source: ``$CTGAN_STEP_TIMEOUT`` seconds, default 1800 — far above
any measured legitimate gap (largest first-compile on record: 460 s for the
bench program; IS evals: ~60 s) but a fraction of a queue leg's budget.
``CTGAN_STEP_TIMEOUT=0`` disables.  (The reference has no analogue; its
failure story is tflib/train_loop_2.py's resume-on-restart, which this
repo already matches — the watchdog closes the *detection* half.)
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

__all__ = ["StepWatchdog", "EXIT_CODE"]

EXIT_CODE = 3  # distinct from timeout(1)'s 124: queue runners retry on it


def _deadline_from_env() -> float:
    try:
        return float(os.environ.get("CTGAN_STEP_TIMEOUT", "1800"))
    except ValueError:
        return 1800.0


class StepWatchdog:
    """Abort the process if the training loop stops beating.

    Usage::

        wd = StepWatchdog.start_from_env(name="good64")
        try:
            for ...:
                step(...)
                wd.beat()
        finally:
            wd.stop()

    ``start_from_env`` returns a no-op watchdog when disabled, so call
    sites never branch.
    """

    def __init__(self, deadline: float, name: str = "train",
                 poll: float | None = None, _exit=os._exit):
        self.deadline = float(deadline)
        self.name = name
        self._exit = _exit
        self._poll = poll if poll is not None else min(30.0, self.deadline / 4)
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def start_from_env(cls, name: str = "train") -> "StepWatchdog":
        deadline = _deadline_from_env()
        wd = cls(deadline, name=name)
        if deadline > 0:
            wd.start()
        return wd

    def start(self) -> None:
        self._last = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name=f"step-watchdog-{self.name}", daemon=True
        )
        self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # -- internals -----------------------------------------------------
    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            quiet = time.monotonic() - self._last
            if quiet >= self.deadline:
                self._fire(quiet)
                return

    def _fire(self, quiet: float) -> None:
        sys.stderr.write(
            f"StepWatchdog[{self.name}]: no step progress for {quiet:.0f}s "
            f"(deadline {self.deadline:.0f}s) — assuming a wedged runtime "
            f"call; dumping thread stacks and exiting {EXIT_CODE} so the "
            f"queue retries from the last checkpoint.\n"
        )
        try:
            faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
        except Exception:
            pass
        sys.stderr.flush()
        sys.stdout.flush()
        self._exit(EXIT_CODE)
