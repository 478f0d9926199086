"""Shape/smoke tests for every model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.core import init_context, rng_context
from ctgan_tpu.models import classifiers, dcgan, fc, good64, lsun128, resnet_cifar


def _run(fn, *args, seed=0, **kwargs):
    with init_context(seed=seed) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            out = fn(*args, **kwargs)
    return out, ctx.params


def test_mnist_gan_shapes():
    imgs, gparams = _run(dcgan.mnist_generator, 4, dim=16)
    assert imgs.shape == (4, 784)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
    (logits, feats), dparams = _run(dcgan.mnist_discriminator, imgs, dim=16)
    assert logits.shape == (4,)
    assert feats.shape == (4, 4 * 4 * 4 * 16)
    assert all(k.startswith("Generator") for k in gparams)
    assert all(k.startswith("Discriminator") for k in dparams)


def test_mnist_gan_wgan_mode_has_bn():
    _, gparams = _run(dcgan.mnist_generator, 2, dim=8, mode="wgan")
    assert "Generator.BN1.offset" in gparams
    _, gparams2 = _run(dcgan.mnist_generator, 2, dim=8, mode="wgan-CT")
    assert "Generator.BN1.offset" not in gparams2


def test_cifar_gan_shapes():
    imgs, _ = _run(dcgan.cifar_generator, 3, dim=16)
    assert imgs.shape == (3, 3072)
    (logits, feats), dparams = _run(dcgan.cifar_discriminator, imgs, dim=16)
    assert logits.shape == (3,)
    assert feats.shape == (3, 4 * 4 * 4 * 16)
    # wgan-CT: no BN in D (CT_gan_cifar.py:88-94)
    assert not any("BN" in k for k in dparams)


def test_resnet_cifar_conditional_acgan():
    cfg = resnet_cifar.ResnetCifarConfig(dim_g=32, dim_d=32)
    labels = jnp.asarray([0, 1, 2, 3])
    imgs, gparams = _run(resnet_cifar.generator, 4, labels, cfg=cfg)
    assert imgs.shape == (4, 3072)
    # conditional BN tables exist
    assert any(v.ndim == 2 and v.shape[0] == 10 for k, v in gparams.items() if "offset" in k)
    out, dparams = _run(resnet_cifar.discriminator, imgs, labels, 0.8, 0.5, 0.5, cfg)
    assert out.wgan.shape == (4,)
    assert out.features.shape == (4, 32)
    assert out.acgan.shape == (4, 10)


def test_resnet_cifar_unconditional():
    cfg = resnet_cifar.ResnetCifarConfig(dim_g=16, dim_d=16, conditional=False, acgan=False)
    imgs, _ = _run(resnet_cifar.generator, 2, None, cfg=cfg)
    out, _ = _run(resnet_cifar.discriminator, imgs, None, cfg=cfg)
    assert out.acgan is None


def test_good64_shapes():
    imgs, _ = _run(good64.good64_generator, 2, dim=16)
    assert imgs.shape == (2, 64 * 64 * 3)
    (logits, feats), _ = _run(good64.good64_discriminator, imgs, 16)
    assert logits.shape == (2,)
    assert feats.shape == (2, 4 * 4 * 8 * 16)


@pytest.mark.slow
def test_resnet101_64_shapes():
    imgs, _ = _run(good64.resnet101_64_generator, 1, dim=16)
    assert imgs.shape == (1, 64 * 64 * 3)
    (logits, _), _ = _run(good64.resnet101_64_discriminator, imgs, dim=16)
    assert logits.shape == (1,)


def test_lsun128_shapes():
    cfg = lsun128.Lsun128Config(
        dim_g_4=32, dim_g_8=16, dim_g_16=16, dim_g_32=8, dim_g_64=8,
        dim_d_64=8, dim_d_32=16, dim_d_16=16, dim_d_8=32,
    )
    imgs, _ = _run(lsun128.lsun128_generator, 2, cfg=cfg)
    assert imgs.shape == (2, 3 * 128 * 128)
    (logits, feats), _ = _run(lsun128.lsun128_discriminator, imgs, 0.8, 0.5, 0.5, cfg)
    assert logits.shape == (2,)
    assert feats.shape == (2, 32)


def test_dcgan64_and_variants():
    imgs, _ = _run(dcgan.dcgan64_generator, 2, dim=8)
    assert imgs.shape == (2, 64 * 64 * 3)
    (l, f), _ = _run(dcgan.dcgan64_discriminator, imgs, dim=8)
    assert l.shape == (2,)
    imgs2, _ = _run(dcgan.crippled_dcgan64_generator, 2, dim=8)
    assert imgs2.shape == (2, 64 * 64 * 3)
    imgs3, _ = _run(dcgan.multiplicative_dcgan64_generator, 2, dim=8)
    assert imgs3.shape == (2, 64 * 64 * 3)
    (l3, _), _ = _run(dcgan.multiplicative_dcgan64_discriminator, imgs3, dim=8)
    assert l3.shape == (2,)


def test_fc_models():
    imgs, _ = _run(fc.fc_generator, 2, output_dim=48, fc_dim=32)
    assert imgs.shape == (2, 48)
    (l, h), _ = _run(fc.fc_discriminator, imgs, input_dim=48, fc_dim=32)
    assert l.shape == (2,)


def test_mnist_ssl_models():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(8, 784)).astype("float32"))
    out, params = _run(classifiers.mnist_ssl_classifier, x)
    assert out.logits.shape == (8, 10)
    assert out.features.shape == (8, 250)
    assert out.fm_features.shape == (8, 250)
    imgs, _ = _run(classifiers.mnist_ssl_generator, 4)
    assert imgs.shape == (4, 784)
    assert float(imgs.min()) >= 0 and float(imgs.max()) <= 1


def test_cifar_ssl_models():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3072)).astype("float32"))
    out, _ = _run(classifiers.cifar_ssl_classifier, x)
    assert out.logits.shape == (4, 10)
    assert out.features.shape == (4, 128)
    imgs, _ = _run(classifiers.cifar_ssl_generator, 2)
    assert imgs.shape == (2, 3072)


def test_two_passes_share_weights_differ_by_dropout():
    """The CT-pair property: same params, different dropout draws."""
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            imgs = dcgan.cifar_generator(4, dim=16)
            l1, f1 = dcgan.cifar_discriminator(imgs, dim=16)
            l2, f2 = dcgan.cifar_discriminator(imgs, dim=16)
    n_disc = len([k for k in ctx.params if k.startswith("Discriminator")])
    assert n_disc == 8  # 3 convs (W+b) + output linear (W+b): created once
    assert not np.allclose(np.asarray(l1), np.asarray(l2))  # dropout differs
