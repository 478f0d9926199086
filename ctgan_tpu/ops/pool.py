"""Spatial resampling ops used by the ResNet GAN blocks.

The reference implements 2x mean-pool as a 4-way strided-slice add
(CT_gan_cifar_resnet.py:90-92) and 2x upsample as channel-quadruple +
``depth_to_space`` (CT_gan_cifar_resnet.py:103-109).  Both are cheap
data-movement ops that XLA handles well on TPU; we express them with reshapes
so Mosaic/XLA lowers them to layout changes rather than gathers.

All ops are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mean_pool", "upsample_nearest", "depth_to_space", "space_to_depth", "global_mean_pool"]


def mean_pool(x: jax.Array) -> jax.Array:
    """2x2 mean pool, stride 2 (the reference's 4-slice average)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4))


def depth_to_space(x: jax.Array, block: int = 2) -> jax.Array:
    """NHWC depth-to-space (tf.depth_to_space equivalent)."""
    n, h, w, c = x.shape
    oc = c // (block * block)
    x = x.reshape(n, h, w, block, block, oc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, oc)


def space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, c * block * block)


def upsample_nearest(x: jax.Array) -> jax.Array:
    """2x nearest-neighbour upsample.

    The reference concatenates the input 4x on the channel axis then
    depth_to_space's it (UpsampleConv, CT_gan_cifar_resnet.py:103-109) —
    mathematically nearest-neighbour upsampling.  Expressed directly as a
    broadcast so XLA sees the intent.
    """
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def global_mean_pool(x: jax.Array) -> jax.Array:
    """Mean over spatial dims: NHWC -> NC (reduce_mean axis=[2,3] in NCHW,
    CT_gan_cifar_resnet.py:181)."""
    return jnp.mean(x, axis=(1, 2))
