"""Fully-connected G/D (CT_gan_64x64.py:224-236, 425-438)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import leaky_relu, linear, relu
from .common import noise_input

__all__ = ["fc_generator", "fc_discriminator"]


def fc_generator(
    n_samples: int,
    noise: jax.Array | None = None,
    *,
    output_dim: int = 64 * 64 * 3,
    fc_dim: int = 512,
) -> jax.Array:
    z = noise_input(n_samples, 128, noise)
    out = relu(linear("Generator.1.Linear", 128, fc_dim, z, initialization="he"))
    out = relu(linear("Generator.2.Linear", fc_dim, fc_dim, out, initialization="he"))
    out = relu(linear("Generator.3.Linear", fc_dim, fc_dim, out, initialization="he"))
    out = relu(linear("Generator.4.Linear", fc_dim, fc_dim, out, initialization="he"))
    out = linear("Generator.Out", fc_dim, output_dim, out)
    return jnp.tanh(out)


def fc_discriminator(
    inputs: jax.Array,
    *,
    input_dim: int = 64 * 64 * 3,
    fc_dim: int = 512,
    n_layers: int = 3,
) -> tuple[jax.Array, jax.Array]:
    out = leaky_relu(
        linear("Discriminator.Input.Linear", input_dim, fc_dim, inputs, initialization="he")
    )
    for i in range(n_layers):
        out = leaky_relu(
            linear(f"Discriminator.{i}.Linear", fc_dim, fc_dim, out, initialization="he")
        )
    logits = linear("Discriminator.Out", fc_dim, 1, out)
    return logits.reshape(-1), out
