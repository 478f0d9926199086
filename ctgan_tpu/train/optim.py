"""Optimizer framework.

Rebuilds every update rule the reference uses or ships:

* TF ``AdamOptimizer`` (eps *outside* the sqrt) — the GAN trainers
  (CT_gan_cifar.py:153-154: lr=1e-4, β1=0.5, β2=0.9; resnet: β1=0).
* Theano hand-rolled Adam (eps *inside* the sqrt) — ``nn.py:30-47``,
  used by the semi-supervised classifiers.
* TF ``RMSPropOptimizer`` — plain-WGAN mode (CT_gan_mnist.py:121-127).
* Nadam / Adamax — the LSUN fork's optimizer library
  (``LSUN_bedrooms/tflib/ops/nadam.py``, ``adamax.py``).
* SGD + momentum.

Design is optax-shaped but self-contained: ``Optimizer(init, update)`` over
flat name→array param dicts; ``update(grads, state, params, step)`` returns
``(new_params, new_state)``.  Learning rates may be floats or
``callable(step) -> scalar`` schedules; everything jits and shards — under
``pjit`` the elementwise updates fuse into one kernel per step.

Gradient transforms: per-element value clipping (train_loop.py:60-65),
global-norm clipping with the norm surfaced as a metric
(train_loop_2.py:66-80), and post-update weight clipping for weight-clipped
WGAN (CT_gan_mnist.py:138-148).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "Optimizer",
    "adam",
    "adam_theano",
    "rmsprop",
    "nadam",
    "adamax",
    "sgd",
    "momentum",
    "with_state_dtype",
    "clip_grads_by_value",
    "clip_grads_by_global_norm",
    "global_norm",
    "clip_params_by_value",
]

Params = dict
Grads = dict
Schedule = Callable[[jax.Array], jax.Array]


class Optimizer(NamedTuple):
    init: Callable[[Params], dict]
    update: Callable[[Grads, dict, Params, jax.Array], tuple[Params, dict]]


def _resolve_lr(lr, step):
    return lr(step) if callable(lr) else jnp.asarray(lr, jnp.float32)


def _zeros_like_tree(params):
    return {k: jnp.zeros_like(v) for k, v in params.items()}


def adam(lr=1e-4, beta1=0.9, beta2=0.999, eps=1e-8) -> Optimizer:
    """TF-semantics Adam: lr_t = lr·√(1−β2^t)/(1−β1^t);
    p −= lr_t · m / (√v + eps)."""

    def init(params):
        return {"m": _zeros_like_tree(params), "v": _zeros_like_tree(params),
                "t": jnp.zeros((), jnp.float32)}

    def update(grads, state, params, step):
        t = state["t"] + 1.0
        lr_t = _resolve_lr(lr, step) * jnp.sqrt(1.0 - beta2**t) / (1.0 - beta1**t)
        new_m, new_v, new_p = {}, {}, {}
        for k, p in params.items():
            g = grads[k]
            m = beta1 * state["m"][k] + (1.0 - beta1) * g
            v = beta2 * state["v"][k] + (1.0 - beta2) * jnp.square(g)
            new_m[k], new_v[k] = m, v
            new_p[k] = p - lr_t * m / (jnp.sqrt(v) + eps)
        return new_p, {"m": new_m, "v": new_v, "t": t}

    return Optimizer(init, update)


def adam_theano(lr=3e-4, mom1=0.9, mom2=0.999, eps=1e-8) -> Optimizer:
    """The classifiers' hand-rolled Adam (nn.py:30-47): explicit bias-corrected
    m̂/√(v̂ + eps) — eps inside the sqrt."""

    def init(params):
        return {"m": _zeros_like_tree(params), "v": _zeros_like_tree(params),
                "t": jnp.ones((), jnp.float32)}

    def update(grads, state, params, step):
        t = state["t"]
        new_m, new_v, new_p = {}, {}, {}
        lr_v = _resolve_lr(lr, step)
        for k, p in params.items():
            g = grads[k]
            m = mom1 * state["m"][k] + (1.0 - mom1) * g
            v = mom2 * state["v"][k] + (1.0 - mom2) * jnp.square(g)
            m_hat = m / (1.0 - mom1**t)
            v_hat = v / (1.0 - mom2**t)
            new_m[k], new_v[k] = m, v
            new_p[k] = p - lr_v * m_hat / jnp.sqrt(v_hat + eps)
        return new_p, {"m": new_m, "v": new_v, "t": t + 1.0}

    return Optimizer(init, update)


def rmsprop(lr=5e-5, rho=0.9, momentum_=0.0, eps=1e-10) -> Optimizer:
    """TF RMSProp (CT_gan_mnist.py:121-127 wgan mode)."""

    def init(params):
        return {"ms": _zeros_like_tree(params), "mom": _zeros_like_tree(params)}

    def update(grads, state, params, step):
        lr_v = _resolve_lr(lr, step)
        new_ms, new_mom, new_p = {}, {}, {}
        for k, p in params.items():
            g = grads[k]
            ms = rho * state["ms"][k] + (1.0 - rho) * jnp.square(g)
            mom = momentum_ * state["mom"][k] + lr_v * g / jnp.sqrt(ms + eps)
            new_ms[k], new_mom[k] = ms, mom
            new_p[k] = p - mom
        return new_p, {"ms": new_ms, "mom": new_mom}

    return Optimizer(init, update)


def nadam(lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8) -> Optimizer:
    """Nesterov Adam (LSUN fork nadam.py update rule)."""

    def init(params):
        return {"m": _zeros_like_tree(params), "v": _zeros_like_tree(params),
                "t": jnp.zeros((), jnp.float32)}

    def update(grads, state, params, step):
        t = state["t"] + 1.0
        lr_v = _resolve_lr(lr, step)
        new_m, new_v, new_p = {}, {}, {}
        for k, p in params.items():
            g = grads[k]
            m = beta1 * state["m"][k] + (1.0 - beta1) * g
            v = beta2 * state["v"][k] + (1.0 - beta2) * jnp.square(g)
            m_hat = m / (1.0 - beta1 ** (t + 1.0))
            g_hat = g / (1.0 - beta1**t)
            v_hat = v / (1.0 - beta2**t)
            new_m[k], new_v[k] = m, v
            new_p[k] = p - lr_v * (beta1 * m_hat + (1.0 - beta1) * g_hat) / (
                jnp.sqrt(v_hat) + eps
            )
        return new_p, {"m": new_m, "v": new_v, "t": t}

    return Optimizer(init, update)


def adamax(lr=2e-3, beta1=0.9, beta2=0.999, eps=1e-8) -> Optimizer:
    """Adamax (LSUN fork adamax.py:9-60)."""

    def init(params):
        return {"m": _zeros_like_tree(params), "u": _zeros_like_tree(params),
                "t": jnp.zeros((), jnp.float32)}

    def update(grads, state, params, step):
        t = state["t"] + 1.0
        lr_v = _resolve_lr(lr, step) / (1.0 - beta1**t)
        new_m, new_u, new_p = {}, {}, {}
        for k, p in params.items():
            g = grads[k]
            m = beta1 * state["m"][k] + (1.0 - beta1) * g
            u = jnp.maximum(beta2 * state["u"][k], jnp.abs(g))
            new_m[k], new_u[k] = m, u
            new_p[k] = p - lr_v * m / (u + eps)
        return new_p, {"m": new_m, "u": new_u, "t": t}

    return Optimizer(init, update)


def sgd(lr=1e-2) -> Optimizer:
    def init(params):
        return {}

    def update(grads, state, params, step):
        lr_v = _resolve_lr(lr, step)
        return {k: p - lr_v * grads[k] for k, p in params.items()}, state

    return Optimizer(init, update)


def momentum(lr=1e-2, mu=0.9, nesterov=False) -> Optimizer:
    def init(params):
        return {"mom": _zeros_like_tree(params)}

    def update(grads, state, params, step):
        lr_v = _resolve_lr(lr, step)
        new_mom, new_p = {}, {}
        for k, p in params.items():
            m = mu * state["mom"][k] + grads[k]
            new_mom[k] = m
            step_dir = grads[k] + mu * m if nesterov else m
            new_p[k] = p - lr_v * step_dir
        return new_p, {"mom": new_mom}

    return Optimizer(init, update)


def with_state_dtype(opt: Optimizer, dtype) -> Optimizer:
    """Store the moment buffers of ``opt`` in ``dtype`` (e.g. bfloat16).

    Params stay fp32 master weights; only the per-param optimizer state
    trees (m/v/mom/...) are round-tripped through ``dtype`` between steps —
    on an HBM-bound step this halves the optimizer-state read+write traffic.
    Scalar entries (the step counter ``t``) keep their dtype.  The update
    math itself still runs in the inner rule's precision: state is upcast
    to fp32 before ``opt.update`` and the new state downcast after, so the
    only numerics change is the storage rounding (bf16 keeps fp32's
    exponent; ~8 mantissa bits of the moments are kept).

    No reference analogue — TF-1.2 Adam slots were fp32-only; this is the
    TPU-native byte-cut lever (ships default-off, see AcganConfig).
    """

    def _cast(tree, to):
        return {
            k: ({kk: vv.astype(to) for kk, vv in v.items()}
                if isinstance(v, dict) else v)
            for k, v in tree.items()
        }

    def init(params):
        return _cast(opt.init(params), dtype)

    def update(grads, state, params, step):
        new_p, new_s = opt.update(grads, _cast(state, jnp.float32),
                                  params, step)
        return new_p, _cast(new_s, dtype)

    return Optimizer(init, update)


# ------------------------------------------------------------- transforms

def clip_grads_by_value(grads: Grads, limit: float = 1.0) -> Grads:
    """Per-element clip ±limit (train_loop.py:60-65)."""
    return {k: jnp.clip(g, -limit, limit) for k, g in grads.items()}


def global_norm(grads: Grads) -> jax.Array:
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in grads.values()))


def clip_grads_by_global_norm(grads: Grads, max_norm: float = 5.0) -> tuple[Grads, jax.Array]:
    """Global-norm clip; returns (clipped, pre-clip norm) so the trainer can
    log 'gradnorm' like train_loop_2.py:66-80."""
    norm = global_norm(grads)
    factor = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return {k: g * factor for k, g in grads.items()}, norm


def clip_params_by_value(params: Params, limit: float = 0.01) -> Params:
    """Weight-clipped WGAN: clip D params into [−limit, limit] after each
    update (CT_gan_mnist.py:138-148)."""
    return {k: jnp.clip(p, -limit, limit) for k, p in params.items()}
