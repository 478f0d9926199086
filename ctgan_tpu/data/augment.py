"""On-device data augmentation.

Replaces the reference's per-image host Python loops — the 100k-iteration
per-epoch flip/crop loop in CT_CIFAR.py:203-265 was the pipeline's dominant
cost (SURVEY §3.3).  Here augmentation is a vectorized jitted transform over
the whole batch (or the whole dataset at once): reflect-pad 2px, random
horizontal flip, random 32x32 crop — identical distribution, zero host work.

Also includes the dequantization noise used by the ResNet trainer
(uniform[0, 1/128) added to [-1,1] images, CT_gan_cifar_resnet.py:202) and
the random-flip used by the LSUN directory loader.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["random_flip", "random_crop_flip", "dequantize", "two_stream_augment"]


def random_flip(images: jax.Array, key: jax.Array) -> jax.Array:
    """Per-image random horizontal flip; NHWC or NCHW with axis inferred as
    the last-but-one (width) for NHWC input."""
    n = images.shape[0]
    flip = jax.random.bernoulli(key, 0.5, (n,))
    flipped = jnp.flip(images, axis=2) if images.ndim == 4 else images[..., ::-1]
    shape = (n,) + (1,) * (images.ndim - 1)
    return jnp.where(flip.reshape(shape), flipped, images)


def random_crop_flip(
    images: jax.Array,
    key: jax.Array,
    *,
    pad: int = 2,
    crop: int | None = None,
) -> jax.Array:
    """Reflect-pad + random crop + random flip, NHWC batch, fully vectorized.

    Matches CT_CIFAR.py:48,211-265: pad 2 reflect each side, offsets uniform
    over [0, 2*pad].
    """
    n, h, w, c = images.shape
    crop_h = crop or h
    crop_w = crop or w
    kf, ky, kx = jax.random.split(key, 3)
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    oy = jax.random.randint(ky, (n,), 0, 2 * pad + 1)
    ox = jax.random.randint(kx, (n,), 0, 2 * pad + 1)

    def crop_one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0, 0), (crop_h, crop_w, c))

    cropped = jax.vmap(crop_one)(padded, oy, ox)
    return random_flip(cropped, kf)


def two_stream_augment(images: jax.Array, key: jax.Array, **kw):
    """Two *independently* augmented copies of the same unlabeled stream —
    the property the CT classifiers rely on (CT_CIFAR.py:225-257)."""
    k1, k2 = jax.random.split(key)
    return random_crop_flip(images, k1, **kw), random_crop_flip(images, k2, **kw)


def dequantize(images: jax.Array, key: jax.Array, levels: float = 128.0) -> jax.Array:
    """x + U[0, 1/levels) (CT_gan_cifar_resnet.py:202)."""
    return images + jax.random.uniform(
        key, images.shape, images.dtype, 0.0, 1.0 / levels
    )
