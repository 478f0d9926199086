"""GAN loss engine: WGAN / WGAN-CT / DCGAN / LSGAN + ACGAN head.

Rebuilds the inlined loss blocks of the reference trainers:

* WGAN + consistency term + gradient penalty — CT_gan_cifar.py:123-151
* DCGAN sigmoid-CE — CT_gan_mnist.py:157-180
* LSGAN — CT_gan_64x64.py (mode=='lsgan' branch)
* ACGAN auxiliary classifier — CT_gan_cifar_resnet.py:245-266,314-330

TPU-native notes: the reference needed a 2-GPU A/B split because the
GP double-backward would not fit beside three D passes on a 2017 GPU
(CT_gan_cifar_resnet.py:205-293).  Here everything is one traced function —
the clean pass, the two CT passes, and the ``jax.grad``-of-``jax.grad`` GP
pass all fuse into one XLA program, and data parallelism shards the batch
axis instead of splitting the graph.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "wgan_losses",
    "consistency_term",
    "gradient_penalty",
    "input_slopes",
    "dcgan_losses",
    "lsgan_losses",
    "acgan_loss",
    "acgan_accuracy",
]

DiscFn = Callable[[jax.Array], tuple[jax.Array, jax.Array]]


def wgan_losses(d_real: jax.Array, d_fake: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(gen_cost, disc_cost) for the Wasserstein objective
    (CT_gan_cifar.py:125-126).  Reductions in fp32 regardless of the
    activation dtype."""
    d_real = d_real.astype(jnp.float32)
    d_fake = d_fake.astype(jnp.float32)
    gen_cost = -jnp.mean(d_fake)
    disc_cost = jnp.mean(d_fake) - jnp.mean(d_real)
    return gen_cost, disc_cost


def consistency_term(
    d_real: jax.Array,
    d_real_2: jax.Array,
    feat_real: jax.Array,
    feat_real_2: jax.Array,
    *,
    lambda_2: float = 2.0,
    factor_m: float = 0.0,
    feature_weight: float = 0.1,
) -> jax.Array:
    """CT = mean(max(λ2·(D−D')² + 0.1·λ2·mean((D_−D_')², axis=1) − M, 0))
    (CT_gan_cifar.py:131-134).  The two inputs must come from two passes over
    the *same* examples and weights with independent dropout draws."""
    d_real = d_real.astype(jnp.float32)
    d_real_2 = d_real_2.astype(jnp.float32)
    feat_real = feat_real.astype(jnp.float32)
    feat_real_2 = feat_real_2.astype(jnp.float32)
    ct = lambda_2 * jnp.square(d_real - d_real_2)
    ct = ct + lambda_2 * feature_weight * jnp.mean(
        jnp.square(feat_real - feat_real_2), axis=1
    )
    return jnp.mean(jnp.maximum(ct - factor_m, 0.0))


def gradient_penalty(
    disc_fn: DiscFn,
    real: jax.Array,
    fake: jax.Array,
    alpha_key: jax.Array,
    *,
    target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """One-sided-interpolate gradient penalty (CT_gan_cifar.py:137-151).

    Returns ``(mean((‖∇D(x̂)‖₂ − target)²), slopes)``.  The inner gradient is
    ``jax.grad`` through the full discriminator (including dropout masks held
    constant); the outer parameter gradient then differentiates through it —
    the double backward the reference built with ``tf.gradients`` inside the
    loss graph.
    """
    # one alpha per example, broadcast over the remaining dims whatever the
    # input rank (flat [B, D] for every bundled model; NHWC-safe too)
    alpha = jax.random.uniform(
        alpha_key, (real.shape[0],) + (1,) * (real.ndim - 1), jnp.float32
    )
    interpolates = real + alpha * (fake - real)

    def scalar_d(x):
        # sum trick: rows of the gradient are per-example input gradients
        return jnp.sum(disc_fn(x)[0].astype(jnp.float32))

    grads = jax.grad(scalar_d)(interpolates)
    grads = grads.astype(jnp.float32)
    slopes = jnp.sqrt(jnp.sum(jnp.square(grads), axis=tuple(range(1, grads.ndim))) + 1e-12)
    gp = jnp.mean(jnp.square(slopes - target))
    return gp, slopes


def input_slopes(disc_fn: DiscFn, x: jax.Array) -> jax.Array:
    """‖∂D(x)/∂x‖₂ per example — the reference's slope-on-real-data monitor
    (CT_gan_cifar.py:140-149, 'slope_real' metric)."""

    def scalar_d(v):
        return jnp.sum(disc_fn(v)[0].astype(jnp.float32))

    grads = jax.grad(scalar_d)(x)
    grads = grads.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(jnp.square(grads), axis=tuple(range(1, grads.ndim))) + 1e-12)


def _sigmoid_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """tf.nn.sigmoid_cross_entropy_with_logits."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def dcgan_losses(d_real: jax.Array, d_fake: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Non-saturating sigmoid-CE GAN (CT_gan_mnist.py:157-180)."""
    gen_cost = jnp.mean(_sigmoid_ce(d_fake, jnp.ones_like(d_fake)))
    disc_cost = jnp.mean(_sigmoid_ce(d_fake, jnp.zeros_like(d_fake)))
    disc_cost = disc_cost + jnp.mean(_sigmoid_ce(d_real, jnp.ones_like(d_real)))
    return gen_cost, disc_cost / 2.0


def lsgan_losses(d_real: jax.Array, d_fake: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Least-squares GAN (CT_gan_64x64.py lsgan branch)."""
    d_real = d_real.astype(jnp.float32)
    d_fake = d_fake.astype(jnp.float32)
    gen_cost = jnp.mean(jnp.square(d_fake - 1.0))
    disc_cost = (jnp.mean(jnp.square(d_fake)) + jnp.mean(jnp.square(d_real - 1.0))) / 2.0
    return gen_cost, disc_cost


def acgan_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Sparse softmax CE (CT_gan_cifar_resnet.py:245-248)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def acgan_accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Classification accuracy monitor (CT_gan_cifar_resnet.py:249-266)."""
    return jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
