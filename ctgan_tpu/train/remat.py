"""Leak-safe rematerialization of the discriminator forward.

``jax.checkpoint`` caches the traced jaxpr of its target keyed on (function
identity, input avals).  A discriminator that reads weights from the ambient
``apply_context`` (and dropout keys from the ambient RNG streams) captures
those tracers as jaxpr *constants* — the cache then retains dead tracers
after the trace ends, and the next trace that hits the cache explodes with
``UnexpectedTracerError`` (the round-2 bench_all cross-workload failure,
ROADMAP r2 #4).

Fix: thread everything traced through the checkpoint boundary as explicit
arguments — the ambient param dict and a fresh base RNG key — so the cached
jaxpr is tracer-free and safely shared across traces.

RNG note: inside the checkpointed pass, streams derive from the explicit
base key (one per call, from the ambient ``"remat"`` stream counter), so two
CT passes still differ only in their dropout draws; the draws themselves
differ from the non-remat path's (different derivation), which only reseeds
the masks — same semantics class as the reference (SURVEY §7 RNG fidelity).
"""

from __future__ import annotations

from typing import Callable

import jax

from ..core import apply_context, rng_context, store
from ..core import rng as rng_mod

__all__ = ["make_remat_disc"]


def make_remat_disc(disc_fn: Callable, n_static_tail: int = 0) -> Callable:
    """Wrap ``disc_fn(x, *args)`` in ``jax.checkpoint``.

    ``n_static_tail``: how many trailing arguments are static python values
    (e.g. the ACGAN keep-probs) rather than traced arrays.
    """

    def _inner(params, base_key, *args):
        with rng_context({"default": base_key}):
            with apply_context(params):
                return disc_fn(*args)

    cache: dict[tuple, Callable] = {}

    def _wrapped(*args):
        # static tail indices in _inner's signature (params, base_key, *args)
        n = len(args)
        statics = tuple(range(2 + n - n_static_tail, 2 + n)) if n_static_tail else ()
        if statics not in cache:
            cache[statics] = jax.checkpoint(_inner, static_argnums=statics)
        ctx = store.current_context()
        return cache[statics](dict(ctx.params), rng_mod.next_key("remat"), *args)

    return _wrapped
