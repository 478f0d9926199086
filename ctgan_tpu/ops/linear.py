"""Fully-connected layer (rebuild of ``tflib/ops/linear.py``).

TPU notes: the matmul runs on the MXU; inputs are cast to the active compute
dtype (bf16 by default on TPU) with fp32 accumulation via
``preferred_element_type``.  Parameters stay fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import store
from ..core.matmul import matmul as _mxu_matmul
from .init import linear_initializer

__all__ = ["linear"]


def linear(
    name: str,
    input_dim: int,
    output_dim: int,
    inputs: jax.Array,
    *,
    biases: bool = True,
    initialization: str | tuple | None = None,
    weightnorm: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """y = x @ W (+ b), with the reference's init menu and optional
    weight-norm reparameterization (tflib/ops/linear.py:24-148)."""
    ctx = store.current_context()

    def make_w():
        return linear_initializer(ctx.rng, input_dim, output_dim, initialization, gain)

    weight = store.param(name + ".W", make_w)

    if weightnorm:
        # g initialized to the column norms of the initial W
        # (tflib/ops/linear.py:113-126); reads W from the store so the init
        # matches whatever W was created with.
        w_init = weight

        def make_g():
            return np.sqrt(np.sum(np.square(np.asarray(w_init)), axis=0)).astype(
                "float32"
            )

        target_norms = store.param(name + ".g", make_g)
        norms = jnp.sqrt(jnp.sum(jnp.square(weight), axis=0))
        weight = weight * (target_norms / norms)

    if inputs.ndim == 2:
        result = _mxu_matmul(inputs, weight)
    else:
        flat = inputs.reshape(-1, input_dim)
        result = _mxu_matmul(flat, weight)
        result = result.reshape(*inputs.shape[:-1], output_dim)

    if biases:
        b = store.param(
            name + ".b", lambda: np.zeros((output_dim,), dtype="float32")
        )
        result = result + b.astype(result.dtype)
    return result
