"""Debug/diagnostic utilities (rebuild of ``LSUN_bedrooms/tflib/debug.py``
and the reference's in-training diagnostics, SURVEY §4).

* ``stats`` — per-tensor mean/std/min/max probes (debug.py:7-29), usable
  inside jit via ``jax.debug.print``.
* ``assert_finite`` — NaN/Inf tripwire (the analogue of running with
  jax.debug_nans, but selective).
* ``check_grads_exist`` — the '[no grad!]' detector from the param printers
  (CT_gan_cifar_resnet.py:381-382).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stats", "print_stats", "assert_finite", "check_grads_exist"]


def stats(x: jax.Array) -> dict:
    x = x.astype(jnp.float32)
    return {
        "mean": jnp.mean(x),
        "std": jnp.std(x),
        "min": jnp.min(x),
        "max": jnp.max(x),
    }


def print_stats(name: str, x: jax.Array) -> None:
    """Inside-jit tensor probe."""
    s = stats(x)
    jax.debug.print(
        name + " mean={m:.4f} std={s:.4f} min={mn:.4f} max={mx:.4f}",
        m=s["mean"], s=s["std"], mn=s["min"], mx=s["max"],
    )


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side check after a step; raises with the offending leaf names."""
    bad = []
    for k, v in jax.tree_util.tree_leaves_with_path(tree):
        if not np.isfinite(np.asarray(v)).all():
            bad.append(jax.tree_util.keystr(k))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def check_grads_exist(grads: Mapping[str, jax.Array]) -> list[str]:
    """Names of params whose gradient is identically zero (the reference's
    '[no grad!]' warning class)."""
    return [k for k, g in grads.items() if float(jnp.max(jnp.abs(g))) == 0.0]
