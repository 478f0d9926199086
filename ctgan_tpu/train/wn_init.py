"""Data-dependent weight-norm initialization driver.

The reference compiles a special ``init_param(x)`` Theano function whose
updates rescale every weight-normed layer's ``g``/``b`` from the statistics
of one init batch (CT_MNIST.py:64-66,100,146; CT_CIFAR.py:101-103,205).

Here: call the model once with ``dd_init=True`` inside an apply context —
each WN layer standardizes its output *in-pass* (so downstream layers see
initialized statistics, exactly like the Lasagne ``init=True`` flow) and
records its new ``g``/``b`` in ``ctx.init_updates``; this helper merges them
into the param tree.
"""

from __future__ import annotations

from typing import Callable

import jax

from ..core import apply_context, rng_context

__all__ = ["data_dependent_init"]


def data_dependent_init(
    params: dict,
    init_pass: Callable[[], None],
    key: jax.Array,
) -> dict:
    """Run ``init_pass`` (a closure calling the model with ``dd_init=True``)
    and return params with the recorded g/b updates applied."""
    with rng_context({"default": key}):
        with apply_context(params) as ctx:
            init_pass()
            updates = dict(ctx.init_updates)
    out = dict(params)
    for k, v in updates.items():
        if k not in out:
            raise KeyError(f"init update for unknown param {k!r}")
        out[k] = jax.numpy.asarray(v)
    return out
