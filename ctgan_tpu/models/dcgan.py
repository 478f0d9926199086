"""DCGAN-family generators/discriminators.

Rebuilds of:
* MNIST G/D — CT_gan_mnist.py:62-108
* CIFAR-10 conv G/D — CT_gan_cifar.py:58-100
* 64x64 DCGAN G/D (+ gated "multiplicative" and crippled variants) —
  CT_gan_64x64.py:238-321, 327-344, 380-396, 430-467

Contract: generators return flat C-major image vectors in the reference's
value range (sigmoid [0,1] for MNIST, tanh [-1,1] elsewhere); discriminators
take flat vectors and return ``(logits [N], features [N, F])`` where the
feature tensor is the pre-output hidden layer the CT term penalizes
(CT_gan_cifar.py:97-100).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import batchnorm, conv2d, deconv2d, dropout, layernorm, leaky_relu, linear, relu
from ..ops.init import WeightsStdevOverride
from .common import flat_to_nhwc, nhwc_to_flat, noise_input

__all__ = [
    "mnist_generator",
    "mnist_discriminator",
    "cifar_generator",
    "cifar_discriminator",
    "dcgan64_generator",
    "dcgan64_discriminator",
    "crippled_dcgan64_generator",
    "multiplicative_dcgan64_generator",
    "multiplicative_dcgan64_discriminator",
]


def _maybe_bn(use_bn: bool, name: str, x: jax.Array) -> jax.Array:
    return batchnorm(name, x) if use_bn else x


# ---------------------------------------------------------------- MNIST

def mnist_generator(
    n_samples: int,
    noise: jax.Array | None = None,
    *,
    dim: int = 64,
    mode: str = "wgan-CT",
) -> jax.Array:
    """CT_gan_mnist.py:62-87.  BN only in plain-'wgan' mode."""
    use_bn = mode == "wgan"
    z = noise_input(n_samples, 128, noise)
    out = linear("Generator.Input", 128, 4 * 4 * 4 * dim, z)
    if use_bn:
        out = batchnorm("Generator.BN1", out)
    out = relu(out)
    out = out.reshape(-1, 4, 4, 4 * dim)

    out = deconv2d("Generator.2", 4 * dim, 2 * dim, 5, out)
    if use_bn:
        out = batchnorm("Generator.BN2", out)
    out = relu(out)
    out = out[:, :7, :7, :]  # 8x8 -> 7x7 crop (CT_gan_mnist.py:76)

    out = deconv2d("Generator.3", 2 * dim, dim, 5, out)
    if use_bn:
        out = batchnorm("Generator.BN3", out)
    out = relu(out)

    out = deconv2d("Generator.5", dim, 1, 5, out)
    out = jax.nn.sigmoid(out)
    return nhwc_to_flat(out)


def mnist_discriminator(
    inputs: jax.Array,
    *,
    dim: int = 64,
    mode: str = "wgan-CT",
    keep_prob: float = 0.5,
    deterministic: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """CT_gan_mnist.py:89-108: 3 stride-2 convs with dropout after each
    activation; returns (D logits, D_ pre-logit features)."""
    use_bn = mode == "wgan"
    out = flat_to_nhwc(inputs, 1, 28, 28)
    out = conv2d("Discriminator.1", 1, dim, 5, out, stride=2)
    out = leaky_relu(out)
    out = dropout(out, keep_prob, deterministic=deterministic)
    out = conv2d("Discriminator.2", dim, 2 * dim, 5, out, stride=2)
    if use_bn:
        out = batchnorm("Discriminator.BN2", out)
    out = leaky_relu(out)
    out = dropout(out, keep_prob, deterministic=deterministic)
    out = conv2d("Discriminator.3", 2 * dim, 4 * dim, 5, out, stride=2)
    if use_bn:
        out = batchnorm("Discriminator.BN3", out)
    out = leaky_relu(out)
    out = dropout(out, keep_prob, deterministic=deterministic)
    features = out.reshape(-1, 4 * 4 * 4 * dim)
    logits = linear("Discriminator.Output", 4 * 4 * 4 * dim, 1, features)
    return logits.reshape(-1), features


# ---------------------------------------------------------------- CIFAR conv

def cifar_generator(
    n_samples: int,
    noise: jax.Array | None = None,
    *,
    dim: int = 128,
) -> jax.Array:
    """CT_gan_cifar.py:58-79: BN always on in G."""
    z = noise_input(n_samples, 128, noise)
    out = linear("Generator.Input", 128, 4 * 4 * 4 * dim, z)
    out = batchnorm("Generator.BN1", out)
    out = relu(out)
    out = out.reshape(-1, 4, 4, 4 * dim)
    out = deconv2d("Generator.2", 4 * dim, 2 * dim, 5, out)
    out = batchnorm("Generator.BN2", out)
    out = relu(out)
    out = deconv2d("Generator.3", 2 * dim, dim, 5, out)
    out = batchnorm("Generator.BN3", out)
    out = relu(out)
    out = deconv2d("Generator.5", dim, 3, 5, out)
    out = jnp.tanh(out)
    return nhwc_to_flat(out)


def cifar_discriminator(
    inputs: jax.Array,
    *,
    dim: int = 128,
    mode: str = "wgan-CT",
    keep_prob: float = 0.5,
    deterministic: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """CT_gan_cifar.py:81-100.  BN in D only when mode != wgan-CT."""
    use_bn = mode != "wgan-CT"
    out = flat_to_nhwc(inputs, 3, 32, 32)
    out = conv2d("Discriminator.1", 3, dim, 5, out, stride=2)
    out = leaky_relu(out)
    out = dropout(out, keep_prob, deterministic=deterministic)
    out = conv2d("Discriminator.2", dim, 2 * dim, 5, out, stride=2)
    if use_bn:
        out = batchnorm("Discriminator.BN2", out)
    out = leaky_relu(out)
    out = dropout(out, keep_prob, deterministic=deterministic)
    out = conv2d("Discriminator.3", 2 * dim, 4 * dim, 5, out, stride=2)
    if use_bn:
        out = batchnorm("Discriminator.BN3", out)
    out = leaky_relu(out)
    out = dropout(out, keep_prob, deterministic=deterministic)
    features = out.reshape(-1, 4 * 4 * 4 * dim)
    logits = linear("Discriminator.Output", 4 * 4 * 4 * dim, 1, features)
    return logits.reshape(-1), features


# ---------------------------------------------------------------- 64x64 DCGAN

def dcgan64_generator(
    n_samples: int,
    noise: jax.Array | None = None,
    *,
    dim: int = 64,
    bn: bool = True,
    nonlinearity=relu,
) -> jax.Array:
    """CT_gan_64x64.py:238-272 (0.02-stdev init override while building)."""
    with WeightsStdevOverride(0.02):
        z = noise_input(n_samples, 128, noise)
        out = linear("Generator.Input", 128, 4 * 4 * 8 * dim, z)
        out = out.reshape(-1, 4, 4, 8 * dim)
        out = _maybe_bn(bn, "Generator.BN1", out)
        out = nonlinearity(out)
        for i, (cin, cout) in enumerate([(8, 4), (4, 2), (2, 1)], start=2):
            out = deconv2d(f"Generator.{i}", cin * dim, cout * dim, 5, out)
            out = _maybe_bn(bn, f"Generator.BN{i}", out)
            out = nonlinearity(out)
        out = deconv2d("Generator.5", dim, 3, 5, out)
        out = jnp.tanh(out)
    return nhwc_to_flat(out)


def dcgan64_discriminator(
    inputs: jax.Array,
    *,
    dim: int = 64,
    bn: bool = True,
    nonlinearity=leaky_relu,
    mode: str = "dcgan",
) -> tuple[jax.Array, jax.Array]:
    """CT_gan_64x64.py:440-467.  In mode 'wgan-ct' the Normalize dispatcher
    (CT_gan_64x64.py:91-96) swaps discriminator BN for layer norm."""

    def norm(name, x):
        if not bn:
            return x
        return layernorm(name, x) if mode == "wgan-ct" else batchnorm(name, x)

    with WeightsStdevOverride(0.02):
        out = flat_to_nhwc(inputs, 3, 64, 64)
        out = conv2d("Discriminator.1", 3, dim, 5, out, stride=2)
        out = nonlinearity(out)
        for i, (cin, cout) in enumerate([(1, 2), (2, 4), (4, 8)], start=2):
            out = conv2d(f"Discriminator.{i}", cin * dim, cout * dim, 5, out, stride=2)
            out = norm(f"Discriminator.BN{i}", out)
            out = nonlinearity(out)
        features = out.reshape(-1, 4 * 4 * 8 * dim)
        logits = linear("Discriminator.Output", 4 * 4 * 8 * dim, 1, features)
    return logits.reshape(-1), features


def crippled_dcgan64_generator(
    n_samples: int, noise: jax.Array | None = None, *, dim: int = 64
) -> jax.Array:
    """WGAN-paper generator: no BN, constant filter count
    (CT_gan_64x64.py:274-295)."""
    z = noise_input(n_samples, 128, noise)
    out = relu(linear("Generator.Input", 128, 4 * 4 * dim, z))
    out = out.reshape(-1, 4, 4, dim)
    for i in range(2, 5):
        out = relu(deconv2d(f"Generator.{i}", dim, dim, 5, out))
    out = jnp.tanh(deconv2d("Generator.5", dim, 3, 5, out))
    return nhwc_to_flat(out)


def _gate(x: jax.Array) -> jax.Array:
    """Split channels even/odd and gate (CT_gan_64x64.py:333)."""
    from ..ops import gated_nonlinearity

    return gated_nonlinearity(x[..., ::2], x[..., 1::2])


def multiplicative_dcgan64_generator(
    n_samples: int, noise: jax.Array | None = None, *, dim: int = 64, bn: bool = True
) -> jax.Array:
    """CT_gan_64x64.py:327-356."""
    z = noise_input(n_samples, 128, noise)
    out = linear("Generator.Input", 128, 4 * 4 * 8 * dim * 2, z)
    out = out.reshape(-1, 4, 4, 8 * dim * 2)
    out = _gate(_maybe_bn(bn, "Generator.BN1", out))
    for i, (cin, cout) in enumerate([(8, 4), (4, 2), (2, 1)], start=2):
        out = deconv2d(f"Generator.{i}", cin * dim, cout * dim * 2, 5, out)
        out = _gate(_maybe_bn(bn, f"Generator.BN{i}", out))
    out = jnp.tanh(deconv2d("Generator.5", dim, 3, 5, out))
    return nhwc_to_flat(out)


def multiplicative_dcgan64_discriminator(
    inputs: jax.Array, *, dim: int = 64, bn: bool = True, mode: str = "dcgan"
) -> tuple[jax.Array, jax.Array]:
    """CT_gan_64x64.py:380-403; Normalize swaps to layer norm in wgan-ct."""

    def norm(name, x):
        if not bn:
            return x
        return layernorm(name, x) if mode == "wgan-ct" else batchnorm(name, x)

    out = flat_to_nhwc(inputs, 3, 64, 64)
    out = _gate(conv2d("Discriminator.1", 3, dim * 2, 5, out, stride=2))
    for i, (cin, cout) in enumerate([(1, 2), (2, 4), (4, 8)], start=2):
        out = conv2d(f"Discriminator.{i}", cin * dim, cout * dim * 2, 5, out, stride=2)
        out = _gate(norm(f"Discriminator.BN{i}", out))
    features = out.reshape(-1, 4 * 4 * 8 * dim)
    logits = linear("Discriminator.Output", 4 * 4 * 8 * dim, 1, features)
    return logits.reshape(-1), features
