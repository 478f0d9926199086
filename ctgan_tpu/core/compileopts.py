"""Tuned per-program XLA compiler options.

The flagship's HBO-byte attribution (VALIDATION.md "HBM-byte cut") showed
16.7% of step traffic is layout-change copies that specific libtpu layout
flags can eliminate; ``tools/layout_ab.py`` measures candidate flags on
hardware.  A validated winner is committed as ``tuned_xla_flags.json`` next
to this module and then applied to every heavy jitted program through
``tuned_compiler_options()``.

Resolution order:
  1. ``CTGAN_XLA_OPTS`` env var — ``off``/``0`` disables tuning entirely;
     otherwise ``flag=value,flag=value`` pairs (or a JSON object) override
     the committed file.
  2. ``tuned_xla_flags.json`` — ``{"tpu": {flag: value, ...}}``.  Missing
     file (the default until a sweep wins) means no options.

Options are TPU-only: on CPU (tests, dryrun_multichip) this always returns
None since libtpu flags are rejected by other backends.
"""

from __future__ import annotations

import json
import os

_FILE = os.path.join(os.path.dirname(__file__), "tuned_xla_flags.json")
_cache: dict | None = None
_loaded = False


def _parse_env(val: str) -> dict | None:
    val = val.strip()
    if val.lower() in ("", "0", "off", "none"):
        return None
    if val.startswith("{"):
        return {str(k): str(v) for k, v in json.loads(val).items()}
    out = {}
    for pair in val.split(","):
        k, _, v = pair.partition("=")
        if k.strip():
            out[k.strip()] = v.strip()
    return out or None


def tuned_compiler_options() -> dict | None:
    """Compiler options for ``jax.jit(compiler_options=...)``, or None."""
    global _cache, _loaded
    import jax

    if jax.devices()[0].platform == "cpu":
        return None
    env = os.environ.get("CTGAN_XLA_OPTS")
    if env is not None:
        return _parse_env(env)
    if not _loaded:
        _loaded = True
        if os.path.exists(_FILE):
            with open(_FILE) as f:
                _cache = json.load(f).get("tpu") or None
    return dict(_cache) if _cache else None
