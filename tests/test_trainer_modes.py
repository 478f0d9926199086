"""Trainer modes and options: lsgan, wgan-gp, grad clipping, multi-step."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.core import init_context, rng_context, split_params
from ctgan_tpu.models import classifiers, dcgan
from ctgan_tpu.train import GanConfig, SslConfig, make_gan_trainer, make_ssl_trainer


def _build(mode, **extra):
    gen_fn = partial(dcgan.mnist_generator, dim=8, mode=mode)
    disc_fn = partial(dcgan.mnist_discriminator, dim=8, mode=mode)
    cfg = GanConfig(mode=mode, batch_size=8, critic_iters=2, **extra)
    init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            disc_fn(gen_fn(2))
    gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
    return init_state(gp, dp), step_fn


def _batch():
    return jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 8, 784)).astype("f4")
    )


def test_lsgan_mode():
    state, step_fn = _build("lsgan")
    state, m = jax.jit(step_fn)(state, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["disc_cost"]))
    assert "gp" not in m and "ct" not in m


def test_wgan_gp_mode_has_gp_not_ct():
    state, step_fn = _build("wgan-gp")
    state, m = jax.jit(step_fn)(state, _batch(), jax.random.PRNGKey(0))
    assert "gp" in m and "ct" not in m


def test_grad_clipping_emits_gradnorm():
    state, step_fn = _build("wgan-CT", clip_global_norm=5.0, clip_grad_value=1.0)
    state, m = jax.jit(step_fn)(state, _batch(), jax.random.PRNGKey(0))
    assert float(m["gradnorm"]) > 0


def test_ssl_multi_step_matches_sequential():
    """multi_step_fn (scan) must equal T sequential step_fn calls."""
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            classifiers.mnist_ssl_classifier(jnp.zeros((2, 784)))
            classifiers.mnist_ssl_generator(2)
    disc, gen, _ = split_params(ctx.params, "Classifier", "Generator")
    cfg = SslConfig(variant="mnist")
    init_state, step_fn, test_fn, multi_step_fn = make_ssl_trainer(
        classifiers.mnist_ssl_classifier, classifiers.mnist_ssl_generator, cfg
    )
    rng = np.random.default_rng(1)
    T, B = 3, 20
    xl = jnp.asarray(rng.uniform(size=(T, B, 784)).astype("f4"))
    yl = jnp.asarray(rng.integers(0, 10, size=(T, B)))
    xu = jnp.asarray(rng.uniform(size=(T, B, 784)).astype("f4"))
    xu2 = jnp.asarray(rng.uniform(size=(T, B, 784)).astype("f4"))
    key = jax.random.PRNGKey(7)

    s_seq = init_state(disc, gen)
    for t in range(T):
        s_seq, _ = step_fn(s_seq, xl[t], yl[t], xu[t], xu2[t], None, key)

    s_multi = init_state(disc, gen)
    s_multi, (metrics, probs, feats) = jax.jit(multi_step_fn)(
        s_multi, xl, yl, xu, xu2, None, key
    )
    assert probs.shape == (T, B, 10)
    for k in s_seq.disc_params:
        np.testing.assert_allclose(
            np.asarray(s_seq.disc_params[k]),
            np.asarray(s_multi.disc_params[k]),
            rtol=2e-4, atol=2e-5,
        )
