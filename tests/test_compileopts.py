"""Tuned XLA compiler options plumbing (core/compileopts.py)."""

from ctgan_tpu.core import compileopts
from ctgan_tpu.core.compileopts import tuned_compiler_options


def test_cpu_always_none(monkeypatch):
    # Tests run on the CPU backend (conftest): libtpu flags must never leak.
    monkeypatch.setenv("CTGAN_XLA_OPTS", "xla_tpu_enable_copy_fusion=true")
    assert tuned_compiler_options() is None


def test_env_parsing():
    p = compileopts._parse_env
    assert p("off") is None and p("0") is None and p("") is None
    assert p("a=1,b=true") == {"a": "1", "b": "true"}
    assert p(' {"a": 1, "b": "x"} ') == {"a": "1", "b": "x"}
    assert p(",") is None
