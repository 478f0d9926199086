"""Stochastic input-perturbation layers.

``gaussian_noise`` rebuilds ``nn.py:232-244`` (GaussianNoiseLayer): additive
N(0, sigma) noise during training, identity at eval.  The semi-supervised
MNIST classifier's CT pair comes from two passes with independent noise draws
(CT_MNIST.py:41-53,64-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng

__all__ = ["gaussian_noise"]


def gaussian_noise(
    x: jax.Array,
    sigma: float = 0.1,
    *,
    deterministic: bool = False,
    stream: str = "noise",
) -> jax.Array:
    if deterministic or sigma == 0:
        return x
    key = rng.next_key(stream)
    return x + sigma * jax.random.normal(key, x.shape, x.dtype)
