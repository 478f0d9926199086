"""Distribution utilities (LSUN fork ``kl_gaussian_gaussian.py``,
``kl_unit_gaussian.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kl_gaussian_gaussian", "kl_unit_gaussian"]


def kl_gaussian_gaussian(mu1, logvar1, mu2, logvar2) -> jax.Array:
    """KL(N(mu1, var1) || N(mu2, var2)), elementwise."""
    return 0.5 * (
        logvar2
        - logvar1
        + (jnp.exp(logvar1) + jnp.square(mu1 - mu2)) / jnp.exp(logvar2)
        - 1.0
    )


def kl_unit_gaussian(mu, logvar) -> jax.Array:
    """KL(N(mu, var) || N(0, 1)), elementwise."""
    return -0.5 * (1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
