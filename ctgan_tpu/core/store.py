"""Functional named-parameter store.

The reference framework's load-bearing mechanism is a global name-keyed
``tf.Variable`` store (``tflib/__init__.py:10-48`` in the reference): every op
routes weight creation through ``lib.param(name, value)`` so that calling
``Discriminator(x)`` four times builds four compute paths that *share weights*.
The consistency term (two dropout-perturbed passes) and the gradient penalty
(an extra pass on interpolates) both depend on this.

The TPU-native redesign keeps the ergonomics (repeated model calls share
weights by name) but makes parameters an explicit flat pytree
(``dict[str, jax.Array]``) threaded through ``jit``/``grad``/``pjit``.  A
thread-local trace context routes ``param()`` calls to that dict:

* ``init_context`` — unknown names are *created* from their initializer
  (host-side NumPy RNG, matching the reference's init distributions).
* ``apply_context`` — unknown names are an error; known names return the
  (possibly traced / sharded) array from the pytree.

Because the context only exists while tracing, the resulting computation is a
pure function of ``(params, inputs, rng)`` and composes with every JAX
transform.
"""

from __future__ import annotations

import contextlib
import re
import threading
from typing import Callable, Iterator, Mapping, MutableMapping

import jax
import numpy as np

__all__ = [
    "param",
    "state",
    "init_context",
    "apply_context",
    "current_context",
    "in_init",
    "params_with_name",
    "split_params",
    "alias_params",
    "name_scope",
    "current_scope",
    "print_model_settings",
    "param_count",
    "format_param_table",
]


class _TraceContext(threading.local):
    def __init__(self):
        self.stack: list["Context"] = []


_TRACE = _TraceContext()


class Context:
    """One tracing context: a flat param dict plus bookkeeping.

    ``create`` selects init (create missing params on the host) vs apply
    (missing params are an error) behaviour.  ``rng`` is a NumPy ``Generator``
    used only at init time — matching the reference, which initializes every
    weight with host NumPy (``tflib/ops/linear.py:40-104``).
    """

    def __init__(
        self,
        params: MutableMapping[str, jax.Array],
        *,
        create: bool,
        rng: np.random.Generator | None = None,
        mutable_state: MutableMapping[str, jax.Array] | None = None,
        state_create: bool | None = None,
    ):
        self.params = params
        self.create = create
        # ``state()`` may create missing entries in init contexts and in
        # apply contexts that explicitly opted in by passing a
        # ``mutable_state`` dict (recalibration sweeps start from empty
        # statistics, train_loop_2.py:236-254).  Plain apply contexts raise
        # instead — a typo'd BN state name must not silently yield fresh
        # statistics.
        self.state_create = (
            state_create
            if state_create is not None
            else (create or mutable_state is not None)
        )
        self.rng = rng
        self.aliases: dict[str, str] = {}
        self.scopes: list[str] = []
        # Non-trainable state (BN moving stats, WN init flags). Kept in a
        # separate dict so optimizers never touch it — the reference marks
        # these ``trainable=False`` (tflib/__init__.py:20-30).
        self.state = {} if mutable_state is None else mutable_state
        # Names created/read this trace, in order (for param tables).
        self.touched: list[str] = []
        # Collected side outputs (data-dependent weightnorm init updates).
        self.init_updates: dict[str, jax.Array] = {}

    # -- alias indirection (tflib/__init__.py:39-48) --------------------
    def resolve(self, name: str) -> str:
        while name in self.aliases:
            name = self.aliases[name]
        return name


@contextlib.contextmanager
def init_context(
    params: MutableMapping[str, jax.Array] | None = None,
    seed: int | np.random.Generator = 0,
) -> Iterator[Context]:
    """Enter a context where ``param()`` creates missing entries."""
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)
    ctx = Context(dict(params or {}), create=True, rng=rng)
    _TRACE.stack.append(ctx)
    try:
        yield ctx
    finally:
        _TRACE.stack.pop()


@contextlib.contextmanager
def apply_context(
    params: Mapping[str, jax.Array],
    mutable_state: MutableMapping[str, jax.Array] | None = None,
) -> Iterator[Context]:
    """Enter a context where ``param()`` reads from an existing pytree."""
    ctx = Context(dict(params), create=False, mutable_state=mutable_state)
    _TRACE.stack.append(ctx)
    try:
        yield ctx
    finally:
        _TRACE.stack.pop()


def current_context() -> Context:
    if not _TRACE.stack:
        raise RuntimeError(
            "No parameter context active. Wrap model calls in "
            "`with init_context(...)` or `with apply_context(params)`."
        )
    return _TRACE.stack[-1]


def in_init() -> bool:
    return bool(_TRACE.stack) and _TRACE.stack[-1].create


@contextlib.contextmanager
def name_scope(scope: str) -> Iterator[None]:
    ctx = current_context()
    ctx.scopes.append(scope)
    try:
        yield
    finally:
        ctx.scopes.pop()


def current_scope() -> str:
    ctx = current_context()
    return ".".join(ctx.scopes)


def _full_name(name: str) -> str:
    ctx = current_context()
    if ctx.scopes:
        return ".".join(ctx.scopes + [name])
    return name


def param(name: str, init_fn: Callable[[], np.ndarray]) -> jax.Array:
    """Create-or-fetch a named parameter.

    ``init_fn`` is only invoked at init time; it must return a NumPy array.
    Mirrors ``lib.param`` (tflib/__init__.py:10-34): repeated calls with the
    same name return the same array, which is what makes the multi-pass
    discriminator share weights.
    """
    ctx = current_context()
    full = ctx.resolve(_full_name(name))
    if full in ctx.params:
        if full not in ctx.touched:
            ctx.touched.append(full)
        return ctx.params[full]
    if not ctx.create:
        raise KeyError(
            f"Parameter {full!r} not found in apply context "
            f"({len(ctx.params)} params available)."
        )
    value = np.asarray(init_fn())
    arr = jax.numpy.asarray(value)
    ctx.params[full] = arr
    ctx.touched.append(full)
    return arr


def state(name: str, init_fn: Callable[[], np.ndarray]) -> jax.Array:
    """Create-or-fetch non-trainable state (e.g. BN moving statistics).

    Missing state is created in init contexts and in apply contexts that
    passed an explicit ``mutable_state`` dict — recalibration sweeps
    legitimately start from empty statistics (train_loop_2.py:236-254).  An
    apply context *without* ``mutable_state`` raises on a missing name so a
    typo cannot silently substitute fresh statistics.
    """
    ctx = current_context()
    full = ctx.resolve(_full_name(name))
    if full in ctx.state:
        return ctx.state[full]
    if not ctx.state_create:
        raise KeyError(
            f"State {full!r} not found in apply context "
            f"({len(ctx.state)} state entries available). Pass "
            f"mutable_state= to apply_context to allow creation."
        )
    ctx.state[full] = jax.numpy.asarray(np.asarray(init_fn()))
    return ctx.state[full]


def update_state(name: str, value: jax.Array) -> None:
    """Record an updated value for a state entry (visible in ctx.state)."""
    ctx = current_context()
    ctx.state[ctx.resolve(_full_name(name))] = value


def alias_params(replace: Mapping[str, str]) -> None:
    """Route reads of one param name to another (tflib/__init__.py:39-44)."""
    ctx = current_context()
    ctx.aliases.update(replace)


def params_with_name(params: Mapping[str, jax.Array], name: str) -> dict[str, jax.Array]:
    """All params whose key contains ``name`` (tflib/__init__.py:36-37).

    Used to build the per-network optimizer var lists: the reference trains
    the generator and discriminator with disjoint Adam instances selected by
    name substring (``CT_gan_cifar.py:112-113``).
    """
    return {k: v for k, v in params.items() if name in k}


def split_params(
    params: Mapping[str, jax.Array], *names: str
) -> tuple[dict[str, jax.Array], ...]:
    """Partition a param dict by name substrings; last group is the rest."""
    groups: list[dict[str, jax.Array]] = [dict() for _ in names]
    rest: dict[str, jax.Array] = {}
    for k, v in params.items():
        for i, n in enumerate(names):
            if n in k:
                groups[i][k] = v
                break
        else:
            rest[k] = v
    return (*groups, rest)


def param_count(params: Mapping[str, jax.Array]) -> int:
    return sum(int(np.prod(v.shape)) for v in params.values())


def format_param_table(params: Mapping[str, jax.Array], title: str = "Params") -> str:
    """Shape/size printout like the reference's param-count printer
    (CT_gan_cifar_resnet.py:369-387)."""
    lines = [f"{title}:"]
    total = 0
    for k in sorted(params):
        shape = tuple(params[k].shape)
        n = int(np.prod(shape)) if shape else 1
        total += n
        lines.append(f"\t{k} ({','.join(map(str, shape))})")
    lines.append(f"Total param count: {total:,}")
    return "\n".join(lines)


_SETTING_RE = re.compile(r"^[A-Z][A-Z0-9_]*$")


def print_model_settings(scope: Mapping[str, object]) -> str:
    """Echo UPPERCASE config constants (tflib/__init__.py:101-107)."""
    keys = sorted(k for k in scope if _SETTING_RE.match(k))
    out = "Uppercase local vars:\n" + "\n".join(
        f"\t{k}: {scope[k]!r}" for k in keys
    )
    print(out)
    return out
