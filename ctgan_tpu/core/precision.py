"""Mixed-precision policy.

TPU MXUs want bf16 operands with fp32 accumulation.  Policy: parameters and
loss reductions stay fp32; matmul/conv operands are cast to the active compute
dtype.  Tests and numerically-delicate paths (the gradient-penalty double
backward) can force fp32 with ``precision_policy("float32")``.
"""

from __future__ import annotations

import contextlib
import threading

import jax.numpy as jnp

__all__ = ["compute_dtype", "precision_policy", "default_tpu_policy"]

_POLICY = threading.local()


def _stack():
    if not hasattr(_POLICY, "stack"):
        _POLICY.stack = []
    return _POLICY.stack


_DEFAULT = jnp.float32


def default_tpu_policy(enable_bf16: bool) -> None:
    """Set the process-wide default compute dtype."""
    global _DEFAULT
    _DEFAULT = jnp.bfloat16 if enable_bf16 else jnp.float32


def compute_dtype():
    s = _stack()
    return s[-1] if s else _DEFAULT


@contextlib.contextmanager
def precision_policy(dtype):
    _stack().append(jnp.dtype(dtype))
    try:
        yield
    finally:
        _stack().pop()
