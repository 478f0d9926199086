"""Semi-supervised GAN-classifier losses.

Rebuilds the Theano loss blocks: CT_MNIST.py:70-98, CT_CIFAR.py:110-160,
CT_CIFAR-10_TE.py:112-122.  All operate on pre-softmax class logits from
:mod:`ctgan_tpu.models.classifiers`.

The unlabeled objective treats ``log_sum_exp(logits)`` as the "real" score:
real examples should have large LSE, generated ones small — plus the CT term
between two stochastic passes (or EMA targets in the temporal-ensembling
variant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import log_sum_exp, softplus

__all__ = [
    "labeled_loss",
    "classification_error",
    "ct_mnist_unlabeled_loss",
    "ct_cifar_unlabeled_loss",
    "ct_te_unlabeled_loss",
    "feature_matching_sq",
    "feature_matching_abs",
    "ema_targets_update",
]


def labeled_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """−mean(l_lab) + mean(LSE) — softmax CE written the reference's way
    (CT_MNIST.py:74-76)."""
    logits = logits.astype(jnp.float32)
    l_lab = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(l_lab) + jnp.mean(log_sum_exp(logits))


def classification_error(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """mean(argmax != label) (CT_MNIST.py:93)."""
    return jnp.mean((jnp.argmax(logits, axis=1) != labels).astype(jnp.float32))


def ct_mnist_unlabeled_loss(
    logits_unl: jax.Array,
    logits_unl2: jax.Array,
    feat_unl: jax.Array,
    feat_unl2: jax.Array,
    logits_fake: jax.Array,
    *,
    lambda_2: float = 0.1,
    factor_m: float = 0.0,
    feature_weight: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """MNIST unlabeled objective (CT_MNIST.py:79-90).

    CT uses *softmax* outputs for the class term; the raw-feature term is
    weighted 0 by default ("makes the model unstable", CT_MNIST.py:85).
    Returns (loss_unl, ct_mean) for logging.
    """
    logits_unl = logits_unl.astype(jnp.float32)
    logits_unl2 = logits_unl2.astype(jnp.float32)
    feat_unl = feat_unl.astype(jnp.float32)
    feat_unl2 = feat_unl2.astype(jnp.float32)
    logits_fake = logits_fake.astype(jnp.float32)
    loss_ct = jnp.mean(
        jnp.square(jax.nn.softmax(logits_unl) - jax.nn.softmax(logits_unl2)), axis=1
    )
    loss_ct_feat = jnp.mean(jnp.square(feat_unl - feat_unl2), axis=1)
    ct = lambda_2 * (loss_ct + feature_weight * loss_ct_feat) - factor_m
    ct_mean = jnp.mean(jnp.maximum(ct, 0.0))

    l_unl = log_sum_exp(logits_unl)
    l_fake = log_sum_exp(logits_fake)
    loss_unl = 0.5 * (
        ct_mean
        - jnp.mean(l_unl)
        + jnp.mean(softplus(l_unl))
        + jnp.mean(softplus(l_fake))
    )
    return loss_unl, ct_mean


def ct_cifar_unlabeled_loss(
    logits_unl: jax.Array,
    logits_unl2: jax.Array,
    feat_unl: jax.Array,
    feat_unl2: jax.Array,
    logits_fake: jax.Array,
    *,
    softmax_weight: float = 0.5,
    feature_weight: float = 0.05,
) -> jax.Array:
    """CIFAR unlabeled objective (CT_CIFAR.py:117-123): weighted softmax-MSE
    + feature-MSE consistency, plus the real/fake LSE terms at weight 0.5."""
    logits_unl = logits_unl.astype(jnp.float32)
    logits_unl2 = logits_unl2.astype(jnp.float32)
    feat_unl = feat_unl.astype(jnp.float32)
    feat_unl2 = feat_unl2.astype(jnp.float32)
    logits_fake = logits_fake.astype(jnp.float32)
    loss_comp = jnp.mean(
        jnp.square(jax.nn.softmax(logits_unl) - jax.nn.softmax(logits_unl2))
    )
    loss_comp_feat = jnp.mean(jnp.square(feat_unl - feat_unl2))
    l_unl = log_sum_exp(logits_unl)
    l_fake = log_sum_exp(logits_fake)
    return (
        feature_weight * loss_comp_feat
        + softmax_weight * loss_comp
        - 0.5 * jnp.mean(l_unl)
        + 0.5 * jnp.mean(softplus(l_unl))
        + 0.5 * jnp.mean(softplus(l_fake))
    )


def ct_te_unlabeled_loss(
    logits_unl: jax.Array,
    feat_unl: jax.Array,
    target_probs: jax.Array,
    target_feats: jax.Array,
    logits_fake: jax.Array,
    *,
    lambda_2: float = 1.0,
    factor_m: float = 0.0,
    feature_weight: float = 0.1,
) -> jax.Array:
    """Temporal-ensembling objective (CT_CIFAR-10_TE.py:112-122): CT against
    bias-corrected EMA targets instead of a second live pass — halving the
    D passes per batch."""
    logits_unl = logits_unl.astype(jnp.float32)
    feat_unl = feat_unl.astype(jnp.float32)
    logits_fake = logits_fake.astype(jnp.float32)
    loss_ct = jnp.mean(jnp.square(jax.nn.softmax(logits_unl) - target_probs), axis=1)
    loss_ct_feat = jnp.mean(jnp.square(feat_unl - target_feats), axis=1)
    ct = lambda_2 * (loss_ct + feature_weight * loss_ct_feat) - factor_m
    ct_mean = jnp.mean(jnp.maximum(ct, 0.0))
    l_unl = log_sum_exp(logits_unl)
    l_fake = log_sum_exp(logits_fake)
    return 0.5 * (
        ct_mean
        - jnp.mean(l_unl)
        + jnp.mean(softplus(l_unl))
        - np.float32(np.log(1.0))
        + jnp.mean(softplus(l_fake))
    )


def feature_matching_sq(feat_fake: jax.Array, feat_real: jax.Array) -> jax.Array:
    """G loss: ‖E[f(G(z))] − E[f(x)]‖² (CT_MNIST.py:96-98)."""
    return jnp.mean(jnp.square(
        jnp.mean(feat_fake.astype(jnp.float32), axis=0)
        - jnp.mean(feat_real.astype(jnp.float32), axis=0)
    ))


def feature_matching_abs(feat_fake: jax.Array, feat_real: jax.Array) -> jax.Array:
    """G loss, L1 variant (CT_CIFAR.py:151-155)."""
    return jnp.mean(jnp.abs(
        jnp.mean(feat_fake.astype(jnp.float32), axis=0)
        - jnp.mean(feat_real.astype(jnp.float32), axis=0)
    ))


def ema_targets_update(
    ensemble: jax.Array,
    epoch_predictions: jax.Array,
    epoch_index: jax.Array | int,
    *,
    decay: float = 0.6,
) -> tuple[jax.Array, jax.Array]:
    """Temporal-ensembling EMA with startup bias correction
    (CT_CIFAR-10_TE.py:305-309): returns (new_ensemble, targets)."""
    new_ensemble = decay * ensemble + (1.0 - decay) * epoch_predictions
    correction = 1.0 - decay ** (jnp.asarray(epoch_index, jnp.float32) + 1.0)
    return new_ensemble, new_ensemble / correction
