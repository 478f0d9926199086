"""Embedding lookup (LSUN fork ``tflib/ops/embedding.py:6-11``)."""

from __future__ import annotations

import jax
import numpy as np

from ..core import store

__all__ = ["embedding"]


def embedding(name: str, n_symbols: int, output_dim: int, indices: jax.Array) -> jax.Array:
    ctx = store.current_context()
    table = store.param(
        name + ".EmbeddingMatrix",
        lambda: ctx.rng.normal(0.0, 1.0, (n_symbols, output_dim)).astype("float32"),
    )
    return table[indices]
