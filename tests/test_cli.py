"""Unified CLI dispatcher (ctgan_tpu/__main__.py) and packaging surface."""

import importlib

import pytest

from ctgan_tpu.__main__ import APPS, _usage, main


def test_usage_lists_every_app(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    for name in APPS:
        assert name in out


def test_unknown_app_is_an_error(capsys):
    assert main(["no-such-app"]) == 2
    err = capsys.readouterr().err
    assert "unknown app" in err and "usage:" in err


@pytest.mark.parametrize("name", sorted(APPS))
def test_every_app_module_exposes_main(name):
    module = importlib.import_module(APPS[name][0])
    assert callable(module.main)


def test_usage_cites_reference_scripts():
    text = _usage()
    assert "CT_gan_cifar_resnet.py" in text
    assert "CT_CIFAR-10_TE.py" in text


def test_package_version():
    import ctgan_tpu

    assert ctgan_tpu.__version__ == "0.1.0"


def test_piped_output_closes_quietly():
    # ``ctgan-tpu list | head -1``: the reader closing the pipe must not
    # traceback (BrokenPipeError is swallowed in main()).
    import subprocess
    import sys

    proc = subprocess.run(
        f"{sys.executable} -m ctgan_tpu list | head -1",
        shell=True, capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0
    assert "Traceback" not in proc.stderr
