"""Dropout with explicit RNG streams.

The CT term is *defined* by two discriminator passes that differ only in their
dropout draws (CT_gan_cifar.py:107-110); dropout therefore must be (a)
per-call independent, (b) deterministic per trace position, and (c) constant
w.r.t. differentiation so the gradient-penalty double backward treats the mask
as data.  ``rng.next_key()`` provides (a)+(b); generating the mask from a key
that doesn't depend on the inputs provides (c).

On TPU the Bernoulli draw lowers to on-device threefry; the mask multiply
fuses into the surrounding elementwise ops.  A Pallas fused-PRNG variant lives
in ``ctgan_tpu.kernels.dropout`` for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng

__all__ = ["dropout", "enable_pallas_dropout"]

_USE_PALLAS = False


def enable_pallas_dropout(enable: bool = True) -> None:
    """Route static-rate dropout through the Pallas on-core PRNG kernel
    (ctgan_tpu.kernels.dropout).  TPU-only; traced keep-probs fall back."""
    global _USE_PALLAS
    _USE_PALLAS = enable


def dropout(
    x: jax.Array,
    keep_prob,
    *,
    deterministic: bool = False,
    stream: str = "dropout",
    key: jax.Array | None = None,
) -> jax.Array:
    """TF-semantics dropout: keep with prob ``keep_prob``, scale by
    ``1/keep_prob`` (tf.nn.dropout in CT_gan_cifar.py:86-96).

    ``keep_prob`` may be a python float or a traced scalar (the ResNet model
    passes per-call keep probs kp1..kp3, CT_gan_cifar_resnet.py:169-186).
    """
    if deterministic:
        return x
    if isinstance(keep_prob, (int, float)) and keep_prob >= 1.0:
        return x
    if key is None:
        key = rng.next_key(stream)
    if _USE_PALLAS and isinstance(keep_prob, (int, float)):
        from ..kernels.dropout import pallas_dropout

        seed = jax.random.key_data(key).reshape(-1)[-1].astype(jnp.int32)
        return pallas_dropout(x, seed, float(keep_prob))
    kp = jnp.asarray(keep_prob, jnp.float32)
    # TF keeps where uniform + keep_prob >= 1, i.e. u < keep_prob.
    mask = jax.random.uniform(key, x.shape, jnp.float32) < kp
    scale = (1.0 / kp).astype(x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros((), x.dtype))
