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


def _build_acgan(**extra):
    from ctgan_tpu.models import resnet_cifar
    from ctgan_tpu.train.trainer_acgan import AcganConfig, make_acgan_trainer

    mcfg = resnet_cifar.ResnetCifarConfig(dim_g=8, dim_d=8)
    cfg = AcganConfig(batch_size=8, critic_iters=2, **extra)
    init_state, step_fn, _, _, _ = make_acgan_trainer(
        lambda n, labels, noise=None: resnet_cifar.generator(
            n, labels, noise=noise, cfg=mcfg
        ),
        lambda x, labels, k1, k2, k3: resnet_cifar.discriminator(
            x, labels, k1, k2, k3, mcfg
        ),
        cfg,
    )
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            labels = jnp.zeros((2,), jnp.int32)
            resnet_cifar.discriminator(
                resnet_cifar.generator(2, labels, cfg=mcfg),
                labels, 0.8, 0.5, 0.5, mcfg,
            )
    gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
    return init_state(gp, dp), step_fn


def test_acgan_clean_pass_off_drops_monitor_not_loss():
    """clean_pass=False removes only the kp=1 monitoring pass (acc_real /
    acc_fake); the training loss path (wgan+ct+gp+acgan) is untouched, so
    disc_cost must match the clean_pass=True step exactly."""
    rng = np.random.default_rng(0)
    reals = jnp.asarray(rng.integers(0, 256, size=(2, 8, 3072)), jnp.int32)
    labs = jnp.asarray(rng.integers(0, 10, size=(2, 8)), jnp.int32)
    key = jax.random.PRNGKey(3)

    state_on, step_on = _build_acgan(clean_pass=True)
    state_off, step_off = _build_acgan(clean_pass=False)
    _, m_on = jax.jit(step_on)(state_on, reals, labs, key)
    _, m_off = jax.jit(step_off)(state_off, reals, labs, key)
    assert "acc_real" in m_on and "acc_fake" in m_on
    assert "acc_real" not in m_off and "acc_fake" not in m_off
    np.testing.assert_allclose(
        np.asarray(m_on["disc_cost"]), np.asarray(m_off["disc_cost"]),
        rtol=1e-5,
    )
    assert np.isfinite(np.asarray(m_off["disc_cost"]))


def test_bf16_opt_state_close_to_fp32():
    """opt_state_dtype='bfloat16' stores the Adam moments in bf16 (half the
    optimizer-state HBM traffic) and stays numerically close to fp32 over
    several steps.  Storage-only rounding: the update math runs fp32."""
    rng = np.random.default_rng(1)
    reals = jnp.asarray(rng.integers(0, 256, size=(2, 8, 3072)), jnp.int32)
    labs = jnp.asarray(rng.integers(0, 10, size=(2, 8)), jnp.int32)

    state32, step32 = _build_acgan()
    state16, step16 = _build_acgan(opt_state_dtype="bfloat16")

    # moment buffers are bf16; the step counter keeps fp32
    assert state16.disc_opt["m"][next(iter(state16.disc_opt["m"]))].dtype == jnp.bfloat16
    assert state16.disc_opt["t"].dtype == jnp.float32
    assert state32.disc_opt["m"][next(iter(state32.disc_opt["m"]))].dtype == jnp.float32

    j32, j16 = jax.jit(step32), jax.jit(step16)
    for i in range(3):
        key = jax.random.PRNGKey(i)
        state32, m32 = j32(state32, reals, labs, key)
        state16, m16 = j16(state16, reals, labs, key)
        # the step must preserve the storage dtype of every opt-state leaf —
        # the gen-side do_gen blend used to upcast bf16 moments to fp32,
        # which broke any lax.scan over the step (carry dtype mismatch)
        for opt in (state16.gen_opt, state16.disc_opt):
            assert opt["m"][next(iter(opt["m"]))].dtype == jnp.bfloat16
            assert opt["v"][next(iter(opt["v"]))].dtype == jnp.bfloat16
    # params remain fp32 master weights in both arms and drift only by the
    # storage rounding of the moments
    k = next(iter(state16.disc_params))
    assert state16.disc_params[k].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(m32["disc_cost"]), np.asarray(m16["disc_cost"]),
        rtol=5e-2, atol=5e-2,
    )


def test_with_state_dtype_rule_equivalence():
    """optim.with_state_dtype round-trips every per-param state tree and
    preserves the rule's trajectory within bf16 rounding on a quadratic."""
    from ctgan_tpu.train import optim

    params = {"w": jnp.linspace(-1.0, 1.0, 32, dtype=jnp.float32)}
    target = jnp.sin(jnp.arange(32, dtype=jnp.float32))

    def grads_of(p):
        return {"w": p["w"] - target}

    for mk in (optim.adam, optim.nadam, optim.adamax, optim.rmsprop,
               optim.momentum):
        o32, o16 = mk(), optim.with_state_dtype(mk(), jnp.bfloat16)
        p32 = p16 = params
        s32, s16 = o32.init(params), o16.init(params)
        for step in range(10):
            st = jnp.asarray(step, jnp.float32)
            p32, s32 = o32.update(grads_of(p32), s32, p32, st)
            p16, s16 = o16.update(grads_of(p16), s16, p16, st)
        for key, tree in s16.items():
            if isinstance(tree, dict):
                assert tree["w"].dtype == jnp.bfloat16, (mk.__name__, key)
        np.testing.assert_allclose(
            np.asarray(p32["w"]), np.asarray(p16["w"]), rtol=2e-2, atol=2e-2
        ), mk.__name__
