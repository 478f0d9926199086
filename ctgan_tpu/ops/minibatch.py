"""Minibatch discrimination (``nn.py:136-174`` MinibatchLayer).

Projects features through a learned tensor and appends per-example
exp-L1-distance statistics against the rest of the batch — the classic
Salimans et al. trick for mode-collapse detection in the discriminator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import store
from ..core.precision import compute_dtype

__all__ = ["minibatch_discrimination"]


def minibatch_discrimination(
    name: str,
    input_dim: int,
    num_kernels: int,
    inputs: jax.Array,
    *,
    dim_per_kernel: int = 5,
) -> jax.Array:
    ctx = store.current_context()
    theta = store.param(
        name + ".theta",
        lambda: ctx.rng.normal(0.0, 0.05, (input_dim, num_kernels, dim_per_kernel)).astype(
            "float32"
        ),
    )
    log_weight_scale = store.param(
        name + ".log_weight_scale",
        lambda: np.zeros((num_kernels, dim_per_kernel), dtype="float32"),
    )
    b = store.param(name + ".b", lambda: -np.ones(num_kernels, dtype="float32"))

    w = theta * (
        jnp.exp(log_weight_scale)
        / jnp.sqrt(jnp.sum(jnp.square(theta), axis=0))
    )
    # activation: [N, K, D]
    dt = compute_dtype()
    act = jnp.einsum("ni,ikd->nkd", inputs.astype(dt), w.astype(dt)).astype(jnp.float32)
    # |act_n - act_m| L1 over D -> [N, M, K]
    abs_dif = jnp.sum(jnp.abs(act[:, None, :, :] - act[None, :, :, :]), axis=-1)
    n = inputs.shape[0]
    mask = 1.0 - jnp.eye(n)
    f = jnp.sum(jnp.exp(-abs_dif) * mask[:, :, None], axis=1)
    f = f + b
    return jnp.concatenate([inputs, f.astype(inputs.dtype)], axis=1)
