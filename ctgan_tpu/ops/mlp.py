"""Multi-layer perceptron helper (LSUN fork ``tflib/ops/mlp.py:20-46``)."""

from __future__ import annotations

import jax

from .activations import relu
from .linear import linear

__all__ = ["mlp"]


def mlp(
    name: str,
    input_dim: int,
    hidden_dim: int,
    output_dim: int,
    n_layers: int,
    inputs: jax.Array,
    *,
    nonlinearity=relu,
) -> jax.Array:
    if n_layers < 3:
        raise ValueError("mlp requires n_layers >= 3 (mlp.py:29)")
    out = nonlinearity(linear(name + ".Input", input_dim, hidden_dim, inputs, initialization="he"))
    for i in range(n_layers - 2):
        out = nonlinearity(
            linear(f"{name}.Hidden{i}", hidden_dim, hidden_dim, out, initialization="he")
        )
    return linear(name + ".Output", hidden_dim, output_dim, out)
