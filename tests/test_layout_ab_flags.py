"""Guard the layout_ab sweep arms against flag-name typos.

A misspelled libtpu flag only surfaces on the chip as a rejected arm,
wasting a queue slot; this scans the installed libtpu binary for each
flag name up front (the sweep itself still tolerates rejects)."""

import mmap
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

LIBTPU = "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so"


@pytest.mark.skipif(not os.path.exists(LIBTPU), reason="libtpu not installed")
def test_all_arm_flags_exist_in_libtpu():
    from layout_ab import ARMS

    flags = sorted({f for opts in ARMS.values() if opts for f in opts})
    with open(LIBTPU, "rb") as fh:
        mm = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            missing = [f for f in flags if mm.find(f.encode()) == -1]
        finally:
            mm.close()
    assert not missing, f"flags absent from libtpu.so: {missing}"
