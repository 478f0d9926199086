"""Learning-rate schedules."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["constant", "linear_decay"]


def constant(lr: float):
    return lambda step: jnp.asarray(lr, jnp.float32)


def linear_decay(lr: float, total_iters: int):
    """lr · max(0, 1 − step/total) (CT_gan_cifar_resnet.py:309-312)."""

    def schedule(step):
        frac = jnp.maximum(0.0, 1.0 - jnp.asarray(step, jnp.float32) / total_iters)
        return jnp.asarray(lr, jnp.float32) * frac

    return schedule
