"""LSUV-style layer-sequential unit-variance initialization.

The reference ships only a 4-line stub (``LSUN_bedrooms/tflib/ops/
lsuv_init.py``); this is a working implementation on top of the param store:
iteratively rescale each selected weight until its layer's output batch
variance is ~1 (Mishkin & Matas 2015).  Complements the Theano-style
data-dependent weight-norm init (ops.weightnorm) for nets without g/b
reparameterization.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import apply_context, rng_context

__all__ = ["lsuv_init"]


def lsuv_init(
    params: dict,
    forward_to_layer: Callable[[str], jax.Array],
    layer_weight_names: Sequence[str],
    key: jax.Array,
    *,
    tol: float = 0.05,
    max_iter: int = 10,
) -> dict:
    """Returns params with each listed weight rescaled for unit output var.

    ``forward_to_layer(name)`` must run the model (inside the installed
    context) and return the pre-activation output of the layer owning
    ``name``.
    """
    params = dict(params)
    for name in layer_weight_names:
        for _ in range(max_iter):
            with rng_context({"default": key}):
                with apply_context(params):
                    out = forward_to_layer(name)
            var = float(jnp.var(out))
            if abs(var - 1.0) < tol or var == 0.0:
                break
            params[name] = params[name] / np.sqrt(var)
    return params
