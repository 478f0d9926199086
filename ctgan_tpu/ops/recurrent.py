"""Recurrent cells (LSUN fork ``tflib/ops/gru.py:8-113``, ``rnn.py:7-33``).

Vestigial in the reference's CT-GAN entry points but part of the library
surface.  TPU-native: the time loop is a ``lax.scan`` (static-shape, compiled
once) instead of a Python unroll.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import store
from .linear import linear

__all__ = ["gru_step", "gru", "rnn_step", "rnn"]


def gru_step(name: str, input_dim: int, hidden_dim: int, x_t: jax.Array, h_prev: jax.Array) -> jax.Array:
    """One GRU step (gru.py:8-40): update/reset gates + candidate."""
    gates = jax.nn.sigmoid(
        linear(
            name + ".Gates",
            input_dim + hidden_dim,
            2 * hidden_dim,
            jnp.concatenate([x_t, h_prev], axis=1),
        )
    )
    update, reset = jnp.split(gates, 2, axis=1)
    scaled = reset * h_prev
    candidate = jnp.tanh(
        linear(
            name + ".Candidate",
            input_dim + hidden_dim,
            hidden_dim,
            jnp.concatenate([x_t, scaled], axis=1),
        )
    )
    return (update * candidate) + ((1.0 - update) * h_prev)


def gru(name: str, input_dim: int, hidden_dim: int, inputs: jax.Array, h0: jax.Array | None = None) -> jax.Array:
    """Run a GRU over [N, T, D] inputs -> [N, T, H] (gru.py:56-113)."""
    n = inputs.shape[0]
    if h0 is None:
        h0_p = store.param(name + ".h0", lambda: np.zeros(hidden_dim, dtype="float32"))
        h0 = jnp.broadcast_to(h0_p, (n, hidden_dim))

    # Materialize params once (create-or-fetch) before the scan so the scan
    # body only reads.
    _ = gru_step(name + ".Step", input_dim, hidden_dim, inputs[:, 0], h0)

    def body(h, x_t):
        h_new = gru_step(name + ".Step", input_dim, hidden_dim, x_t, h)
        return h_new, h_new

    xs = jnp.swapaxes(inputs, 0, 1)  # [T, N, D]
    _, hs = jax.lax.scan(body, h0, xs)
    return jnp.swapaxes(hs, 0, 1)


def rnn_step(name: str, input_dim: int, hidden_dim: int, x_t: jax.Array, h_prev: jax.Array) -> jax.Array:
    """Vanilla tanh RNN cell (rnn.py:7-27)."""
    return jnp.tanh(
        linear(
            name + ".InputToHidden",
            input_dim + hidden_dim,
            hidden_dim,
            jnp.concatenate([x_t, h_prev], axis=1),
        )
    )


def rnn(name: str, input_dim: int, hidden_dim: int, inputs: jax.Array, h0: jax.Array | None = None) -> jax.Array:
    n = inputs.shape[0]
    if h0 is None:
        h0_p = store.param(name + ".h0", lambda: np.zeros(hidden_dim, dtype="float32"))
        h0 = jnp.broadcast_to(h0_p, (n, hidden_dim))
    _ = rnn_step(name + ".Step", input_dim, hidden_dim, inputs[:, 0], h0)

    def body(h, x_t):
        h_new = rnn_step(name + ".Step", input_dim, hidden_dim, x_t, h)
        return h_new, h_new

    xs = jnp.swapaxes(inputs, 0, 1)
    _, hs = jax.lax.scan(body, h0, xs)
    return jnp.swapaxes(hs, 0, 1)
