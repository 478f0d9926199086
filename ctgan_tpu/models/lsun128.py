"""128x128 ResNet WGAN-GP+CT models (rebuild of
wgan_LSUN_Bedrooms128.py:40-205).

Pyramid dims follow the reference: G 1024->512->256->128 channels over
4->64 px then a scaled-upsample output conv to 128 px; D mirrors it with a
stride-2 input conv and three down blocks plus two 8x8 blocks with per-pass
dropout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import batchnorm, conv2d, dropout, global_mean_pool, layernorm, linear, relu
from .blocks import residual_block_stride, scaled_upsample_conv
from .common import flat_to_nhwc, nhwc_to_flat, noise_input

__all__ = ["Lsun128Config", "lsun128_generator", "lsun128_discriminator"]


@dataclass(frozen=True)
class Lsun128Config:
    dim_g_4: int = 1024
    dim_g_8: int = 512
    dim_g_16: int = 256
    dim_g_32: int = 128
    dim_g_64: int = 128
    dim_d_64: int = 128
    dim_d_32: int = 256
    dim_d_16: int = 512
    dim_d_8: int = 1024
    normalization_g: bool = True
    normalization_d: bool = True


def _g_norm(cfg):
    def norm(name, x, labels=None):
        return batchnorm(name, x) if cfg.normalization_g else x

    return norm


def _d_norm(cfg):
    def norm(name, x, labels=None):
        return layernorm(name, x) if cfg.normalization_d else x

    return norm


def lsun128_generator(
    n_samples: int,
    noise: jax.Array | None = None,
    cfg: Lsun128Config = Lsun128Config(),
) -> jax.Array:
    """wgan_LSUN_Bedrooms128.py:137-167."""
    norm = _g_norm(cfg)
    z = noise_input(n_samples, 128, noise)
    out = linear("Generator.Input", 128, 4 * 4 * cfg.dim_g_4, z)
    out = out.reshape(-1, 4, 4, cfg.dim_g_4)
    out = residual_block_stride("Generator.4_3", cfg.dim_g_4, cfg.dim_g_8, 3, out, resample="up", normalize=norm)
    out = residual_block_stride("Generator.8_3", cfg.dim_g_8, cfg.dim_g_16, 3, out, resample="up", normalize=norm)
    out = residual_block_stride("Generator.16_3", cfg.dim_g_16, cfg.dim_g_32, 3, out, resample="up", normalize=norm)
    out = residual_block_stride("Generator.32_3", cfg.dim_g_32, cfg.dim_g_64, 3, out, resample="up", normalize=norm)
    out = norm("Generator.OutputN", out)
    out = relu(out)
    out = scaled_upsample_conv("Generator.Output", cfg.dim_g_64, 3, 5, out, he_init=False)
    out = jnp.tanh(out)
    return nhwc_to_flat(out)


def lsun128_discriminator(
    inputs: jax.Array,
    kp1: float = 0.8,
    kp2: float = 0.5,
    kp3: float = 0.5,
    cfg: Lsun128Config = Lsun128Config(),
    *,
    deterministic: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """wgan_LSUN_Bedrooms128.py:169-205: returns (wgan logits, pooled
    features)."""
    norm = _d_norm(cfg)
    out = flat_to_nhwc(inputs, 3, 128, 128)
    out = conv2d("Discriminator.Input", 3, cfg.dim_d_64, 5, out, he_init=True, stride=2)
    out = residual_block_stride("Discriminator.64_3", cfg.dim_d_64, cfg.dim_d_32, 3, out, resample="down", normalize=norm)
    out = residual_block_stride("Discriminator.32_3", cfg.dim_d_32, cfg.dim_d_16, 3, out, resample="down", normalize=norm)
    out = residual_block_stride("Discriminator.16_3", cfg.dim_d_16, cfg.dim_d_8, 3, out, resample="down", normalize=norm)
    out = dropout(out, kp1, deterministic=deterministic)
    out = residual_block_stride("Discriminator.8_1", cfg.dim_d_8, cfg.dim_d_8, 3, out, resample=None, normalize=norm)
    out = dropout(out, kp2, deterministic=deterministic)
    out = residual_block_stride("Discriminator.8_2", cfg.dim_d_8, cfg.dim_d_8, 3, out, resample=None, normalize=norm)
    out = dropout(out, kp3, deterministic=deterministic)
    features = global_mean_pool(out)
    logits = linear("Discriminator.Output", cfg.dim_d_8, 1, features)
    return logits.reshape(-1), features
