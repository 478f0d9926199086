"""Persistent compilation cache opt-in (utils/compile_cache.py).

The reference rebuilt its TF graph every process (wgan_LSUN_Bedrooms128.py:
296-340); here crash/resume skips recompiles via JAX's persistent cache."""

import jax
import jax.numpy as jnp

from ctgan_tpu.utils import compile_cache
from ctgan_tpu.utils.compile_cache import enable_compilation_cache


def test_disabled_by_env(monkeypatch):
    monkeypatch.setattr(compile_cache, "_done", False)
    monkeypatch.setenv("CTGAN_CACHE_DIR", "0")
    assert enable_compilation_cache() is None
    monkeypatch.setenv("CTGAN_CACHE_DIR", "off")
    assert enable_compilation_cache() is None


def test_cache_populates(monkeypatch, tmp_path_factory):
    cache_dir = str(tmp_path_factory.mktemp("xla_cache"))
    monkeypatch.setattr(compile_cache, "_done", False)
    monkeypatch.delenv("CTGAN_CACHE_DIR", raising=False)
    assert enable_compilation_cache(cache_dir) == cache_dir
    # Idempotent: second call keeps the active dir.
    assert enable_compilation_cache(cache_dir) == cache_dir

    # Persist even trivial compiles for the assertion below.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        @jax.jit
        def f(x):
            return jnp.tanh(x @ x) * 3.0 + 1.0

        f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
        import os

        assert os.listdir(cache_dir), "cache dir should hold an entry"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def test_env_dir_used(monkeypatch, tmp_path_factory):
    env_dir = str(tmp_path_factory.mktemp("xla_cache_env"))
    monkeypatch.setattr(compile_cache, "_done", False)
    monkeypatch.setenv("CTGAN_CACHE_DIR", env_dir)
    assert enable_compilation_cache() == env_dir
