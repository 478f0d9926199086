"""Batch-norm moving-statistic recalibration before evaluation.

Rebuild of ``train_loop_2.py:236-254``: before an eval sweep, run N training
batches through the model with ``update_stats=True`` so the moving statistics
reflect current weights, then evaluate with ``mode="moving"``.

Functional version: state lives in a dict threaded through
``apply_context(mutable_state=...)``; the cumulative ``t/(t+1)`` blend in
``ops.norm.batchnorm`` matches the reference's ``_force_updates``.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax

from ..core import apply_context, rng_context

__all__ = ["recalibrate_bn"]


def recalibrate_bn(
    params: dict,
    model_call: Callable[[jax.Array], object],
    batches: Iterable,
    key: jax.Array,
    *,
    reset: bool = True,
    state: dict | None = None,
) -> dict:
    """Returns fresh BN state after running ``model_call`` (which must pass
    ``update_stats=True`` through to its batchnorms) over ``batches``.

    ``reset=True`` starts from empty statistics (the reference reinitializes
    its stats_iter per recalibration sweep).
    """
    bn_state: dict = {} if reset or state is None else dict(state)
    for i, batch in enumerate(batches):
        with rng_context({"default": jax.random.fold_in(key, i)}):
            with apply_context(params, mutable_state=bn_state) as ctx:
                model_call(batch)
                bn_state = dict(ctx.state)
    return bn_state
