"""Conditional ResNet CT-GAN for CIFAR-10 (rebuild of
CT_gan_cifar_resnet.py:69-186).

The flagship model: 3-block up-sampling ResNet generator with (conditional)
batch norm, 4-block discriminator with global mean-pool features, WGAN head
and optional ACGAN auxiliary classifier head.

Config semantics preserved:
* ``conditional + acgan`` — G uses conditional BN on labels, D is
  label-blind except for the ACGAN head (Normalize drops labels for D,
  CT_gan_cifar_resnet.py:71-85).
* ``normalization_d`` — conditional layernorm in D (the reference's top-level
  copy had a latent bug here, SURVEY §2b; implemented correctly).
* Per-pass keep probs ``kp1..kp3`` (0.8/0.5/0.5 train, 1/1/1 clean pass).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import (
    batchnorm,
    cond_batchnorm,
    cond_layernorm,
    conv2d,
    dropout,
    global_mean_pool,
    layernorm,
    linear,
    relu,
)
from .blocks import optimized_res_block_disc1, residual_block
from .common import flat_to_nhwc, nhwc_to_flat, noise_input

__all__ = ["ResnetCifarConfig", "generator", "discriminator", "DiscOut"]


@dataclass(frozen=True)
class ResnetCifarConfig:
    dim_g: int = 128
    dim_d: int = 128
    n_labels: int = 10
    output_dim: int = 3072
    conditional: bool = True
    acgan: bool = True
    normalization_g: bool = True
    normalization_d: bool = False


class DiscOut(NamedTuple):
    wgan: jax.Array      # [N] critic scores (D)
    features: jax.Array  # [N, dim_d] pooled features (D_)
    acgan: jax.Array | None  # [N, n_labels] aux logits or None


def _g_normalize(cfg: ResnetCifarConfig):
    def norm(name, x, labels):
        if not cfg.normalization_g:
            return x
        if cfg.conditional and labels is not None:
            return cond_batchnorm(name, x, labels, cfg.n_labels)
        return batchnorm(name, x)

    return norm


def _d_normalize(cfg: ResnetCifarConfig):
    def norm(name, x, labels):
        if not cfg.normalization_d:
            return x
        # ACGAN discriminators are label-blind in their trunk
        # (CT_gan_cifar_resnet.py:76-77).
        if cfg.conditional and cfg.acgan:
            labels = None
        if labels is not None:
            return cond_layernorm(name, x, labels, cfg.n_labels)
        return layernorm(name, x)

    return norm


def generator(
    n_samples: int,
    labels: jax.Array | None,
    noise: jax.Array | None = None,
    cfg: ResnetCifarConfig = ResnetCifarConfig(),
) -> jax.Array:
    """CT_gan_cifar_resnet.py:155-167."""
    if not cfg.conditional:
        labels = None
    norm = _g_normalize(cfg)
    z = noise_input(n_samples, 128, noise)
    out = linear("Generator.Input", 128, 4 * 4 * cfg.dim_g, z)
    out = out.reshape(-1, 4, 4, cfg.dim_g)
    for i in (1, 2, 3):
        out = residual_block(
            f"Generator.{i}", cfg.dim_g, cfg.dim_g, 3, out,
            resample="up", labels=labels, normalize=norm,
        )
    out = norm("Generator.OutputN", out, None)
    out = relu(out)
    out = conv2d("Generator.Output", cfg.dim_g, 3, 3, out, he_init=False)
    out = jnp.tanh(out)
    return nhwc_to_flat(out)


def discriminator(
    inputs: jax.Array,
    labels: jax.Array | None,
    kp1: float = 0.8,
    kp2: float = 0.5,
    kp3: float = 0.5,
    cfg: ResnetCifarConfig = ResnetCifarConfig(),
    *,
    deterministic: bool = False,
) -> DiscOut:
    """CT_gan_cifar_resnet.py:169-186: OptimizedResBlock then 3 residual
    blocks with per-block dropout, global mean pool, WGAN + ACGAN heads."""
    if not cfg.conditional:
        labels = None
    norm = _d_normalize(cfg)
    out = flat_to_nhwc(inputs, 3, 32, 32)
    out = optimized_res_block_disc1(out, cfg.dim_d)
    out = residual_block(
        "Discriminator.2", cfg.dim_d, cfg.dim_d, 3, out,
        resample="down", labels=labels, normalize=norm,
    )
    out = dropout(out, kp1, deterministic=deterministic)
    out = residual_block(
        "Discriminator.3", cfg.dim_d, cfg.dim_d, 3, out,
        resample=None, labels=labels, normalize=norm,
    )
    out = dropout(out, kp2, deterministic=deterministic)
    out = residual_block(
        "Discriminator.4", cfg.dim_d, cfg.dim_d, 3, out,
        resample=None, labels=labels, normalize=norm,
    )
    out = dropout(out, kp3, deterministic=deterministic)
    out = relu(out)
    features = global_mean_pool(out)  # [N, dim_d]
    wgan = linear("Discriminator.Output", cfg.dim_d, 1, features).reshape(-1)
    acgan = None
    if cfg.conditional and cfg.acgan:
        acgan = linear("Discriminator.ACGANOutput", cfg.dim_d, cfg.n_labels, features)
    return DiscOut(wgan, features, acgan)
