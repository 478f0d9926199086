"""Shared model helpers.

External tensor contract: like the reference, models consume/produce *flat*
image vectors in C-major (NCHW-flattened) order — e.g. CIFAR batches are
``[N, 3072]`` with channel-major pixels (CT_gan_cifar.py:102,79).  Internally
everything is NHWC for TPU; these helpers do the boundary conversion once per
step (a single cheap transpose that XLA folds into the neighbouring copy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["flat_to_nhwc", "nhwc_to_flat", "noise_input"]


def flat_to_nhwc(x: jax.Array, c: int, h: int, w: int) -> jax.Array:
    return x.reshape(-1, c, h, w).transpose(0, 2, 3, 1)


def nhwc_to_flat(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    return x.transpose(0, 3, 1, 2).reshape(n, c * h * w)


def noise_input(n_samples: int, dim: int = 128, noise: jax.Array | None = None, stream: str = "noise") -> jax.Array:
    """Default latent draw (tf.random_normal([n, 128]))."""
    if noise is not None:
        return noise
    from ..core import rng

    return jax.random.normal(rng.next_key(stream), (n_samples, dim), jnp.float32)
