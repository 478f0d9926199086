"""Functional RNG stream plumbing.

The reference gets stochasticity from stateful library RNGs: ``tf.nn.dropout``
draws a fresh mask per graph op, ``tf.random_normal`` per call.  The CT term
*requires* that two discriminator passes over the same weights see different
dropout draws (``CT_gan_cifar.py:107-110``).

TPU-natively, randomness is explicit: a base ``jax.random`` key per named
stream, and every ``next_key()`` call during a trace folds in a fresh counter.
Trace-time counters give each op instance a distinct, deterministic key —
exactly the reference's "every dropout op is independent" semantics, but
replayable and shard-safe (keys are broadcast; per-element bits are generated
on device).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Iterator, Mapping

import jax

__all__ = ["rng_context", "next_key", "has_rng", "fold_seed"]


class _RngState(threading.local):
    def __init__(self):
        self.stack: list["_Streams"] = []


_STATE = _RngState()


class _Streams:
    def __init__(self, keys: Mapping[str, jax.Array]):
        self.keys = dict(keys)
        self.counters: dict[str, int] = {}

    def next(self, stream: str) -> jax.Array:
        c = self.counters.get(stream, 0)
        self.counters[stream] = c + 1
        if stream in self.keys:
            base = self.keys[stream]
        elif "default" in self.keys:
            # Derive a missing stream from the default key so callers can
            # pass one key for everything.  Recomputed on every call, NEVER
            # cached: under ``jax.checkpoint`` the derivation runs inside the
            # remat sub-trace, and caching that sub-trace tracer in a
            # _Streams that outlives it leaks it into the next trace
            # (UnexpectedTracerError when two workloads share a process —
            # round-2 bench_all failure).
            base = jax.random.fold_in(self.keys["default"], _stable_hash(stream))
        else:
            raise KeyError(
                f"No RNG stream {stream!r}; active streams: {list(self.keys)}"
            )
        return jax.random.fold_in(base, c)


def _stable_hash(s: str) -> int:
    h = 2166136261
    for ch in s.encode():
        h = ((h ^ ch) * 16777619) & 0x7FFFFFFF
    return h


@contextlib.contextmanager
def rng_context(keys: jax.Array | Mapping[str, jax.Array]) -> Iterator[None]:
    """Install RNG streams for the duration of a trace.

    ``keys`` is either a single key (installed as stream ``"default"``) or a
    mapping of stream name → key (e.g. ``{"dropout": k1, "noise": k2}``).
    """
    if not isinstance(keys, Mapping):
        keys = {"default": keys}
    _STATE.stack.append(_Streams(keys))
    try:
        yield
    finally:
        _STATE.stack.pop()


def next_key(stream: str = "default") -> jax.Array:
    """A fresh key for this op instance, deterministic in trace order."""
    if not _STATE.stack:
        raise RuntimeError(
            "No RNG context active. Wrap stochastic model calls in "
            "`with rng_context(key):`."
        )
    return _STATE.stack[-1].next(stream)


def has_rng() -> bool:
    return bool(_STATE.stack)


def fold_seed(key: jax.Array, *ints: int) -> jax.Array:
    out = key
    for i in ints:
        out = jax.random.fold_in(out, i)
    return out
