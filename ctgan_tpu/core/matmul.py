"""MXU-friendly matmul/conv wrappers under the precision policy.

In bf16 mode both operands are cast to bf16 and the op runs without
``preferred_element_type`` (the TPU MXU accumulates bf16 inputs in fp32
internally).  Avoiding ``preferred_element_type`` keeps the autodiff
transpose rules dtype-consistent — with it, the f32 cotangent meets bf16
filters inside the gradient conv and XLA rejects the mixed dtypes.

Output dtype is governed by the *activation* policy: the flagship step is
HBM-bandwidth-bound (tools/cost_analysis.py: ~0.96 TFLOP but 17.5 GB
accessed per iteration at fp32 accounting), so casting every conv output
back to fp32 doubles the activation traffic for no accuracy benefit — norm
layers already compute their statistics in fp32 internally and losses upcast
at the reduction.  ``keep_bf16_activations(True)`` (the default under the
bf16 policy) returns bf16; pass False to restore fp32 returns.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .precision import compute_dtype

__all__ = [
    "matmul",
    "conv",
    "conv_transpose",
    "keep_bf16_activations",
    "conv_dim_order",
]

_KEEP_BF16_ACT = True
_CONV_DIM_ORDER = os.environ.get("CTGAN_CONV_DIM_ORDER", "NHWC")


def keep_bf16_activations(enable: bool) -> None:
    global _KEEP_BF16_ACT
    _KEEP_BF16_ACT = enable


def conv_dim_order(order: str) -> None:
    """Layout HINT for 2-D convs: execute them under NCHW logical order.

    Semantics are unchanged — inputs/filters are transposed in, outputs
    transposed back, so every caller still sees NHWC/HWIO.  What changes is
    the operand order the XLA layout-assignment pass negotiates over —
    one of the inputs to the compiler's layout/fusion choices (the original
    "16.7% layout copies" motivation was corrected to ~0.35 GB/iter,
    VALIDATION.md "Copy attribution corrected"; the arm stays as a
    measured-step-time lever).
    The wrapping transposes are bitcasts whenever layout assignment absorbs
    them; when it cannot, they materialize as copies — i.e. this is a
    measured A/B lever (tools/layout_ab.py arm ``nchw_hint``), not a
    guaranteed win.  Env override: ``CTGAN_CONV_DIM_ORDER=NCHW``.
    """
    global _CONV_DIM_ORDER
    if order not in ("NHWC", "NCHW"):
        raise ValueError(f"conv_dim_order must be NHWC or NCHW, got {order!r}")
    _CONV_DIM_ORDER = order


def _out_dtype(dt):
    return dt if _KEEP_BF16_ACT else jnp.float32


def matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    dt = compute_dtype()
    if dt == jnp.float32:
        return jnp.dot(x, w, preferred_element_type=jnp.float32)
    return jnp.dot(x.astype(dt), w.astype(dt)).astype(_out_dtype(dt))


def _nchw_in(x, filters, dimension_numbers):
    """Apply the NCHW hint when active and the call is a standard 2-D conv."""
    if _CONV_DIM_ORDER == "NCHW" and dimension_numbers == ("NHWC", "HWIO", "NHWC"):
        return (
            jnp.transpose(x, (0, 3, 1, 2)),
            jnp.transpose(filters, (3, 2, 0, 1)),
            ("NCHW", "OIHW", "NCHW"),
            True,
        )
    return x, filters, dimension_numbers, False


def conv(x, filters, *, window_strides, padding, dimension_numbers, feature_group_count=1):
    dt = compute_dtype()
    x, filters, dimension_numbers, hinted = _nchw_in(x, filters, dimension_numbers)
    if dt == jnp.float32:
        out = jax.lax.conv_general_dilated(
            x, filters,
            window_strides=window_strides, padding=padding,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            preferred_element_type=jnp.float32,
        )
    else:
        out = jax.lax.conv_general_dilated(
            x.astype(dt), filters.astype(dt),
            window_strides=window_strides, padding=padding,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
        ).astype(_out_dtype(dt))
    return jnp.transpose(out, (0, 2, 3, 1)) if hinted else out


def conv_transpose(x, filters, *, strides, padding, dimension_numbers):
    dt = compute_dtype()
    x, filters, dimension_numbers, hinted = _nchw_in(x, filters, dimension_numbers)
    if dt == jnp.float32:
        out = jax.lax.conv_transpose(
            x, filters, strides=strides, padding=padding,
            dimension_numbers=dimension_numbers, transpose_kernel=True,
            preferred_element_type=jnp.float32,
        )
    else:
        out = jax.lax.conv_transpose(
            x.astype(dt), filters.astype(dt), strides=strides, padding=padding,
            dimension_numbers=dimension_numbers, transpose_kernel=True,
        ).astype(_out_dtype(dt))
    return jnp.transpose(out, (0, 2, 3, 1)) if hinted else out
