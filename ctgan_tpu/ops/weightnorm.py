"""Weight-normalized layers with data-dependent initialization.

Rebuild of the Theano-side layer library (``Theano_classifier/nn.py:49-133,
398-430``): dense / conv / deconv layers whose weights are L2-normalized per
output unit and scaled by a learned ``g``, with Salimans-Kingma *data-dependent
init* — a special forward pass that rescales ``g`` and sets ``b`` so the
pre-activations of the init batch have zero mean and ``init_stdv`` std.

The semi-supervised classifiers depend on this (``CT_CIFAR.py:101-103,146``:
``init_param(trainx[:500])``).  Functionally: call the model once inside an
``apply_context`` with ``dd_init=True``; the new ``g``/``b`` values are
recorded in ``ctx.init_updates`` and merged into the param tree by
``ctgan_tpu.train.wn_init.data_dependent_init``.

Also includes ``l2normalize`` — weight normalization *without* a learned scale
(nn.py:250-264), used on generator output layers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core import store
from ..core.matmul import conv as _mxu_conv, conv_transpose as _mxu_conv_transpose, matmul as _mxu_matmul

__all__ = ["wn_dense", "wn_conv2d", "wn_deconv2d", "l2_dense"]

_EPS = 1e-6


def _record_init(name: str, new_g, new_b):
    ctx = store.current_context()
    ctx.init_updates[name + ".g"] = new_g
    if new_b is not None:
        ctx.init_updates[name + ".b"] = new_b


def wn_dense(
    name: str,
    input_dim: int,
    output_dim: int,
    inputs: jax.Array,
    *,
    nonlinearity: Callable | None = jax.nn.relu,
    init_stdv: float = 1.0,
    train_g: bool = True,
    dd_init: bool = False,
    w_stdev: float = 0.05,
) -> jax.Array:
    """Weight-normed dense layer (nn.py:398-430 + WeightNormLayer).

    W ~ Normal(0, w_stdev); applied weight is ``g * W / ||W||_col``; bias added
    after normalization; nonlinearity applied last (so the CT feature layer is
    post-activation, matching the reference's layer outputs).
    """
    ctx = store.current_context()
    W = store.param(
        name + ".W",
        lambda: (ctx.rng.normal(0.0, w_stdev, (input_dim, output_dim))).astype(
            "float32"
        ),
    )
    g = store.param(name + ".g", lambda: np.ones(output_dim, dtype="float32"))
    b = store.param(name + ".b", lambda: np.zeros(output_dim, dtype="float32"))

    norms = jnp.sqrt(_EPS + jnp.sum(jnp.square(W), axis=0))
    w_eff = W * (g / norms)
    pre = _mxu_matmul(inputs, w_eff)

    if dd_init:
        m = jnp.mean(pre, axis=0)
        inv_stdv = init_stdv / jnp.sqrt(jnp.mean(jnp.square(pre - m), axis=0))
        _record_init(name, g * inv_stdv, -m * inv_stdv)
        pre = (pre - m) * inv_stdv
    else:
        pre = pre + b.astype(pre.dtype)
    return nonlinearity(pre) if nonlinearity is not None else pre


def wn_conv2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    stride: int = 1,
    pad: str | int = "SAME",
    nonlinearity: Callable | None = jax.nn.relu,
    init_stdv: float = 1.0,
    train_g: bool = True,
    dd_init: bool = False,
    w_stdev: float = 0.05,
) -> jax.Array:
    """Weight-normed NHWC conv (nn.py WeightNormLayer over Conv2DDNNLayer).

    ``pad`` accepts "SAME"/"VALID" or an integer pad (the CIFAR classifier uses
    pad=1 with 3x3 and pad=0, CT_CIFAR.py:81-89).
    """
    ctx = store.current_context()
    W = store.param(
        name + ".W",
        lambda: ctx.rng.normal(
            0.0, w_stdev, (filter_size, filter_size, input_dim, output_dim)
        ).astype("float32"),
    )
    g = store.param(name + ".g", lambda: np.ones(output_dim, dtype="float32"))
    b = store.param(name + ".b", lambda: np.zeros(output_dim, dtype="float32"))

    norms = jnp.sqrt(_EPS + jnp.sum(jnp.square(W), axis=(0, 1, 2)))
    w_eff = W * (g / norms)
    if isinstance(pad, int):
        padding = [(pad, pad), (pad, pad)]
    else:
        padding = pad
    pre = _mxu_conv(
        inputs,
        w_eff,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if dd_init:
        m = jnp.mean(pre, axis=(0, 1, 2))
        inv_stdv = init_stdv / jnp.sqrt(jnp.mean(jnp.square(pre - m), axis=(0, 1, 2)))
        _record_init(name, g * inv_stdv, -m * inv_stdv)
        pre = (pre - m) * inv_stdv
    else:
        pre = pre + b.astype(pre.dtype)
    return nonlinearity(pre) if nonlinearity is not None else pre


def wn_deconv2d(
    name: str,
    input_dim: int,
    output_dim: int,
    filter_size: int,
    inputs: jax.Array,
    *,
    stride: int = 2,
    nonlinearity: Callable | None = jax.nn.relu,
    init_stdv: float = 1.0,
    train_g: bool = True,
    dd_init: bool = False,
    w_stdev: float = 0.05,
) -> jax.Array:
    """Weight-normed stride-2 transposed conv (nn.py Deconv2DLayer +
    WeightNormLayer; per-output-channel norms over (H, W, I))."""
    ctx = store.current_context()
    W = store.param(
        name + ".W",
        lambda: ctx.rng.normal(
            0.0, w_stdev, (filter_size, filter_size, output_dim, input_dim)
        ).astype("float32"),
    )
    g = store.param(name + ".g", lambda: np.ones(output_dim, dtype="float32"))
    b = store.param(name + ".b", lambda: np.zeros(output_dim, dtype="float32"))

    norms = jnp.sqrt(_EPS + jnp.sum(jnp.square(W), axis=(0, 1, 3)))
    w_eff = W * (g / norms)[None, None, :, None]
    pre = _mxu_conv_transpose(
        inputs,
        w_eff,
        strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if dd_init:
        m = jnp.mean(pre, axis=(0, 1, 2))
        inv_stdv = init_stdv / jnp.sqrt(jnp.mean(jnp.square(pre - m), axis=(0, 1, 2)))
        _record_init(name, g * inv_stdv, -m * inv_stdv)
        pre = (pre - m) * inv_stdv
    else:
        pre = pre + b.astype(pre.dtype)
    return nonlinearity(pre) if nonlinearity is not None else pre


def l2_dense(
    name: str,
    input_dim: int,
    output_dim: int,
    inputs: jax.Array,
    *,
    nonlinearity: Callable | None = None,
    w_stdev: float = 0.05,
) -> jax.Array:
    """Dense layer with L2-normalized weights and no learned scale
    (nn.py:250-264 ``l2normalize``); bias-free."""
    ctx = store.current_context()
    W = store.param(
        name + ".W",
        lambda: ctx.rng.normal(0.0, w_stdev, (input_dim, output_dim)).astype("float32"),
    )
    w_eff = W / jnp.sqrt(_EPS + jnp.sum(jnp.square(W), axis=0, keepdims=True))
    pre = _mxu_matmul(inputs, w_eff)
    return nonlinearity(pre) if nonlinearity is not None else pre
