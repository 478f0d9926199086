"""64x64 "Good" ResNet G/D and 101-layer bottleneck ResNet G/D
(rebuild of CT_gan_64x64.py:204-221, 298-323, 357-373, 405-423).

Normalization per the reference's 64x64 ``Normalize``: generator blocks use
batch norm; discriminator blocks use layer norm when mode == 'wgan-ct'
(CT_gan_64x64.py:91-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import batchnorm, conv2d, dropout, layernorm, linear, relu
from .blocks import bottleneck_residual_block, residual_block
from .common import flat_to_nhwc, nhwc_to_flat, noise_input

__all__ = [
    "good64_generator",
    "good64_discriminator",
    "resnet101_64_generator",
    "resnet101_64_discriminator",
]

OUTPUT_DIM = 64 * 64 * 3


def _g_norm(name, x, labels=None):
    return batchnorm(name, x)


def _d_norm_ct(name, x, labels=None):
    return layernorm(name, x)


def good64_generator(
    n_samples: int,
    noise: jax.Array | None = None,
    *,
    dim: int = 64,
) -> jax.Array:
    """GoodGenerator (CT_gan_64x64.py:204-221): 4 up-sampling residual
    blocks 4->64 px."""
    z = noise_input(n_samples, 128, noise)
    out = linear("Generator.Input", 128, 4 * 4 * 8 * dim, z)
    out = out.reshape(-1, 4, 4, 8 * dim)
    out = residual_block("Generator.Res1", 8 * dim, 8 * dim, 3, out, resample="up", normalize=_g_norm)
    out = residual_block("Generator.Res2", 8 * dim, 4 * dim, 3, out, resample="up", normalize=_g_norm)
    out = residual_block("Generator.Res3", 4 * dim, 2 * dim, 3, out, resample="up", normalize=_g_norm)
    out = residual_block("Generator.Res4", 2 * dim, 1 * dim, 3, out, resample="up", normalize=_g_norm)
    out = batchnorm("Generator.OutputN", out)
    out = relu(out)
    out = conv2d("Generator.Output", dim, 3, 3, out)
    out = jnp.tanh(out)
    return nhwc_to_flat(out)


def good64_discriminator(
    inputs: jax.Array,
    dim: int = 64,
    kp1: float = 0.8,
    kp2: float = 0.5,
    kp3: float = 0.5,
    *,
    mode: str = "wgan-ct",
    deterministic: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """GoodDiscriminator (CT_gan_64x64.py:357-373) with per-pass keep
    probs like the LSUN D."""
    norm = _d_norm_ct if mode == "wgan-ct" else _g_norm
    out = flat_to_nhwc(inputs, 3, 64, 64)
    out = conv2d("Discriminator.Input", 3, dim, 3, out, he_init=False)
    out = residual_block("Discriminator.Res1", dim, 2 * dim, 3, out, resample="down", normalize=norm)
    out = residual_block("Discriminator.Res2", 2 * dim, 4 * dim, 3, out, resample="down", normalize=norm)
    out = dropout(out, kp1, deterministic=deterministic)
    out = residual_block("Discriminator.Res3", 4 * dim, 8 * dim, 3, out, resample="down", normalize=norm)
    out = dropout(out, kp2, deterministic=deterministic)
    out = residual_block("Discriminator.Res4", 8 * dim, 8 * dim, 3, out, resample="down", normalize=norm)
    out = dropout(out, kp3, deterministic=deterministic)
    features = out.reshape(-1, 4 * 4 * 8 * dim)
    logits = linear("Discriminator.Output", 4 * 4 * 8 * dim, 1, features)
    return logits.reshape(-1), features


def resnet101_64_generator(
    n_samples: int,
    noise: jax.Array | None = None,
    *,
    dim: int = 64,
) -> jax.Array:
    """101-layer bottleneck ResNet G (CT_gan_64x64.py:298-323)."""
    z = noise_input(n_samples, 128, noise)
    out = linear("Generator.Input", 128, 4 * 4 * 8 * dim, z)
    out = out.reshape(-1, 4, 4, 8 * dim)
    for i in range(6):
        out = bottleneck_residual_block(f"Generator.4x4_{i}", 8 * dim, 8 * dim, 3, out, normalize=_g_norm)
    out = bottleneck_residual_block("Generator.Up1", 8 * dim, 4 * dim, 3, out, resample="up", normalize=_g_norm)
    for i in range(6):
        out = bottleneck_residual_block(f"Generator.8x8_{i}", 4 * dim, 4 * dim, 3, out, normalize=_g_norm)
    out = bottleneck_residual_block("Generator.Up2", 4 * dim, 2 * dim, 3, out, resample="up", normalize=_g_norm)
    for i in range(6):
        out = bottleneck_residual_block(f"Generator.16x16_{i}", 2 * dim, 2 * dim, 3, out, normalize=_g_norm)
    out = bottleneck_residual_block("Generator.Up3", 2 * dim, 1 * dim, 3, out, resample="up", normalize=_g_norm)
    for i in range(6):
        out = bottleneck_residual_block(f"Generator.32x32_{i}", dim, dim, 3, out, normalize=_g_norm)
    out = bottleneck_residual_block("Generator.Up4", dim, dim // 2, 3, out, resample="up", normalize=_g_norm)
    for i in range(5):
        out = bottleneck_residual_block(f"Generator.64x64_{i}", dim // 2, dim // 2, 3, out, normalize=_g_norm)
    out = conv2d("Generator.Out", dim // 2, 3, 1, out, he_init=False)
    out = jnp.tanh(out / 5.0)
    return nhwc_to_flat(out)


def resnet101_64_discriminator(
    inputs: jax.Array,
    *,
    dim: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """101-layer bottleneck ResNet D (CT_gan_64x64.py:405-423)."""
    out = flat_to_nhwc(inputs, 3, 64, 64)
    out = conv2d("Discriminator.In", 3, dim // 2, 1, out, he_init=False)
    for i in range(5):
        out = bottleneck_residual_block(f"Discriminator.64x64_{i}", dim // 2, dim // 2, 3, out, normalize=_d_norm_ct)
    out = bottleneck_residual_block("Discriminator.Down1", dim // 2, dim, 3, out, resample="down", normalize=_d_norm_ct)
    for i in range(6):
        out = bottleneck_residual_block(f"Discriminator.32x32_{i}", dim, dim, 3, out, normalize=_d_norm_ct)
    out = bottleneck_residual_block("Discriminator.Down2", dim, 2 * dim, 3, out, resample="down", normalize=_d_norm_ct)
    for i in range(6):
        out = bottleneck_residual_block(f"Discriminator.16x16_{i}", 2 * dim, 2 * dim, 3, out, normalize=_d_norm_ct)
    out = bottleneck_residual_block("Discriminator.Down3", 2 * dim, 4 * dim, 3, out, resample="down", normalize=_d_norm_ct)
    for i in range(6):
        out = bottleneck_residual_block(f"Discriminator.8x8_{i}", 4 * dim, 4 * dim, 3, out, normalize=_d_norm_ct)
    out = bottleneck_residual_block("Discriminator.Down4", 4 * dim, 8 * dim, 3, out, resample="down", normalize=_d_norm_ct)
    for i in range(6):
        out = bottleneck_residual_block(f"Discriminator.4x4_{i}", 8 * dim, 8 * dim, 3, out, normalize=_d_norm_ct)
    features = out.reshape(-1, 4 * 4 * 8 * dim)
    logits = linear("Discriminator.Output", 4 * 4 * 8 * dim, 1, features)
    return (logits / 5.0).reshape(-1), features
