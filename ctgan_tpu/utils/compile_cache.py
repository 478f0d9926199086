"""Persistent XLA compilation cache.

The big workloads pay heavy compiles on TPU (the LSUN-128 fused step is
~9 minutes on the tunneled v5e); the reference's TF-1.2 sessions rebuilt
their graphs per process just the same (wgan_LSUN_Bedrooms128.py:296-340).
Here every entry point opts into JAX's persistent compilation cache so a
crash/resume or an A/B tool re-run pays the compile once per (HLO, flags)
key instead of once per process.

Disabled by setting ``CTGAN_CACHE_DIR=0`` (or ``""``/``off``); relocated by
setting it to a directory path.  Backends that cannot serialize executables
make JAX skip the cache with a warning — enabling is always safe.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "ctgan_tpu", "xla"
)
_done = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently turn on the persistent compilation cache.

    Returns the cache directory in use, or None when disabled."""
    global _done
    env = os.environ.get("CTGAN_CACHE_DIR")
    if env is not None and env.strip().lower() in ("", "0", "off", "none"):
        return None
    cache_dir = path or env or _DEFAULT
    if _done:
        # the first call's directory is the one jax is actually writing to;
        # report it rather than a newly requested (but unapplied) path
        import jax

        return jax.config.jax_compilation_cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Only persist compiles worth the disk round-trip; every at-schedule
    # workload's step is far above this.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _done = True
    return cache_dir
