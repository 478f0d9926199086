"""Semi-supervised GAN classifiers (rebuild of the Theano side:
CT_MNIST.py:32-53 and CT_CIFAR.py:69-93).

Both discriminator-classifiers are stochastic networks (Gaussian noise /
dropout) whose CT pair is two forward passes with independent draws; both use
weight-normalized layers with data-dependent init (pass ``dd_init=True`` for
the init forward pass, see :mod:`ctgan_tpu.ops.weightnorm`).

Outputs are structured so every reference loss can be formed:
``logits`` (pre-softmax class scores), ``features`` (the layer the CT feature
term and feature matching use).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng
from ..ops import (
    batchnorm,
    dropout,
    gaussian_noise,
    global_mean_pool,
    l2_dense,
    leaky_relu,
    linear,
    relu,
    softplus,
    wn_conv2d,
    wn_dense,
    wn_deconv2d,
)
from .common import flat_to_nhwc, nhwc_to_flat

__all__ = [
    "ClassifierOut",
    "mnist_ssl_classifier",
    "mnist_ssl_generator",
    "cifar_ssl_classifier",
    "cifar_ssl_generator",
]


class ClassifierOut(NamedTuple):
    logits: jax.Array    # [N, 10] pre-softmax
    features: jax.Array  # CT feature-term / feature-matching layer
    fm_features: jax.Array  # clean features for G feature matching


# ------------------------------------------------------------------ MNIST

def mnist_ssl_classifier(
    x: jax.Array,
    *,
    deterministic: bool = False,
    dd_init: bool = False,
) -> ClassifierOut:
    """CT_MNIST.py:40-53: 5 weight-normed dense layers with Gaussian noise
    between each; 10-way output with trainable scale.

    ``features`` is the noise-perturbed final 250-d hidden layer (the
    reference's ``layers[-2]`` used in the CT feature term, CT_MNIST.py:66);
    ``fm_features`` is the clean 250-d activation (``layers[-3]``) used for
    feature matching (CT_MNIST.py:96-98).
    """
    kw = dict(dd_init=dd_init, w_stdev=0.1)  # nn.DenseLayer theta=Normal(0.1)
    out = gaussian_noise(x, 0.3, deterministic=deterministic)
    out = wn_dense("Classifier.D1", 28 * 28, 1000, out, **kw)
    out = gaussian_noise(out, 0.5, deterministic=deterministic)
    out = wn_dense("Classifier.D2", 1000, 500, out, **kw)
    out = gaussian_noise(out, 0.5, deterministic=deterministic)
    out = wn_dense("Classifier.D3", 500, 250, out, **kw)
    out = gaussian_noise(out, 0.5, deterministic=deterministic)
    out = wn_dense("Classifier.D4", 250, 250, out, **kw)
    out = gaussian_noise(out, 0.5, deterministic=deterministic)
    fm = wn_dense("Classifier.D5", 250, 250, out, **kw)
    noisy = gaussian_noise(fm, 0.5, deterministic=deterministic)
    logits = wn_dense(
        "Classifier.Output", 250, 10, noisy, nonlinearity=None, train_g=True, **kw
    )
    return ClassifierOut(logits, noisy, fm)


def mnist_ssl_generator(
    n_samples: int,
    *,
    noise_dim: int = 100,
    noise: jax.Array | None = None,
) -> jax.Array:
    """CT_MNIST.py:33-37: two BN-softplus dense layers (no BN scale) then an
    L2-weight-normalized sigmoid output.  Latent is uniform[0,1)."""
    if noise is None:
        noise = jax.random.uniform(rng.next_key("noise"), (n_samples, noise_dim))
    out = linear("Generator.D1", noise_dim, 500, noise, biases=False)
    out = softplus(batchnorm("Generator.BN1", out, scale=False))
    out = linear("Generator.D2", 500, 500, out, biases=False)
    out = softplus(batchnorm("Generator.BN2", out, scale=False))
    out = l2_dense("Generator.Output", 500, 28 * 28, out, nonlinearity=jax.nn.sigmoid)
    return out


# ------------------------------------------------------------------ CIFAR

def cifar_ssl_classifier(
    x_flat_or_img: jax.Array,
    *,
    deterministic: bool = False,
    dd_init: bool = False,
) -> ClassifierOut:
    """CT_CIFAR.py:79-93: 9 weight-normed lrelu convs + 2 NIN layers +
    global mean pool + weight-normed 10-way dense.

    ``features`` = the 128-d global-pool output (reference ``layers[-2]``,
    used for both the CT feature term and G's feature matching,
    CT_CIFAR.py:112,151-155).  Input: flat [N, 3072] C-major or NHWC images.
    """
    if x_flat_or_img.ndim == 2:
        x = flat_to_nhwc(x_flat_or_img, 3, 32, 32)
    else:
        x = x_flat_or_img
    out = dropout(x, 0.8, deterministic=deterministic)
    kw = dict(nonlinearity=leaky_relu, dd_init=dd_init)
    out = wn_conv2d("Classifier.C1", 3, 128, 3, out, pad=1, **kw)
    out = wn_conv2d("Classifier.C2", 128, 128, 3, out, pad=1, **kw)
    out = wn_conv2d("Classifier.C3", 128, 128, 3, out, pad=1, stride=2, **kw)
    out = dropout(out, 0.5, deterministic=deterministic)
    out = wn_conv2d("Classifier.C4", 128, 256, 3, out, pad=1, **kw)
    out = wn_conv2d("Classifier.C5", 256, 256, 3, out, pad=1, **kw)
    out = wn_conv2d("Classifier.C6", 256, 256, 3, out, pad=1, stride=2, **kw)
    out = dropout(out, 0.5, deterministic=deterministic)
    out = wn_conv2d("Classifier.C7", 256, 512, 3, out, pad="VALID", **kw)
    out = wn_conv2d("Classifier.NIN1", 512, 256, 1, out, **kw)
    out = wn_conv2d("Classifier.NIN2", 256, 128, 1, out, **kw)
    pooled = global_mean_pool(out)  # [N, 128]
    logits = wn_dense(
        "Classifier.Output", 128, 10, pooled, nonlinearity=None, dd_init=dd_init,
        init_stdv=0.1, train_g=True,
    )
    return ClassifierOut(logits, pooled, pooled)


def cifar_ssl_generator(
    n_samples: int,
    *,
    noise_dim: int = 50,
    noise: jax.Array | None = None,
    dd_init: bool = False,
) -> jax.Array:
    """CT_CIFAR.py:69-77: dense->3 deconvs; BN-relu except the final
    weight-normed tanh deconv (train_g, init_stdv=0.1).  Latent uniform.
    Returns flat [N, 3072] C-major images in [-1, 1] (the Theano data
    pipeline normalizes CIFAR to [-0.5, 0.5]; we keep tanh range and let the
    trainer rescale)."""
    if noise is None:
        noise = jax.random.uniform(rng.next_key("noise"), (n_samples, noise_dim))
    out = linear("Generator.D1", noise_dim, 4 * 4 * 512, noise, biases=False)
    out = relu(batchnorm("Generator.BN1", out, scale=False))
    out = out.reshape(-1, 4, 4, 512)
    out = deconv_bn_relu("Generator.DC1", 512, 256, out)
    out = deconv_bn_relu("Generator.DC2", 256, 128, out)
    out = wn_deconv2d(
        "Generator.Output", 128, 3, 5, out, nonlinearity=jnp.tanh,
        init_stdv=0.1, train_g=True, dd_init=dd_init,
    )
    return nhwc_to_flat(out)


def deconv_bn_relu(name: str, cin: int, cout: int, x: jax.Array) -> jax.Array:
    from ..ops import deconv2d

    out = deconv2d(name, cin, cout, 5, x, biases=False)
    out = batchnorm(name + ".BN", out, scale=False)
    return relu(out)
