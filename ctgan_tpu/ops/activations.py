"""Activation functions and small math helpers used across the reference.

Sources: ``LeakyReLU`` (CT_gan_cifar.py:46-47), gated PixelCNN nonlinearity
(CT_gan_64x64.py:98-99), Theano-side helpers ``relu/lrelu/centered_softplus/
log_sum_exp`` (Theano_classifier/nn.py:17-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "leaky_relu",
    "relu",
    "lrelu",
    "centered_softplus",
    "log_sum_exp",
    "gated_nonlinearity",
    "softplus",
]


def leaky_relu(x: jax.Array, alpha: float = 0.2) -> jax.Array:
    return jnp.maximum(alpha * x, x)


relu = jax.nn.relu
lrelu = leaky_relu
softplus = jax.nn.softplus


def centered_softplus(x: jax.Array) -> jax.Array:
    return jax.nn.softplus(x) - np.float32(np.log(2.0))


def log_sum_exp(x: jax.Array, axis: int = 1) -> jax.Array:
    """Numerically-stable log-sum-exp (nn.py:26-28)."""
    m = jnp.max(x, axis=axis)
    return m + jnp.log(jnp.sum(jnp.exp(x - jnp.expand_dims(m, axis)), axis=axis))


def gated_nonlinearity(a: jax.Array, b: jax.Array) -> jax.Array:
    """sigmoid(a) * tanh(b) — PixelCNN gate (CT_gan_64x64.py:98-99)."""
    return jax.nn.sigmoid(a) * jnp.tanh(b)
