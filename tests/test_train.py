"""Trainer integration: a few fused train steps on a tiny MNIST CT-GAN."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.core import init_context, rng_context, split_params
from ctgan_tpu.models import dcgan
from ctgan_tpu.train import GanConfig, make_gan_trainer
from ctgan_tpu.train import optim


DIM = 8
BS = 8
K = 2  # critic iters (small for test speed)


def _build(mode="wgan-CT"):
    gen_fn = partial(dcgan.mnist_generator, dim=DIM, mode=mode)
    disc_fn = partial(dcgan.mnist_discriminator, dim=DIM, mode=mode)
    cfg = GanConfig(mode=mode, batch_size=BS, critic_iters=K, iters=100)
    init_state, step_fn, sample_fn, disc_cost_fn = make_gan_trainer(gen_fn, disc_fn, cfg)

    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            fake = gen_fn(BS)
            disc_fn(fake)
    gen_params, disc_params, rest = split_params(ctx.params, "Generator", "Discriminator")
    assert not rest
    return init_state(gen_params, disc_params), step_fn, sample_fn, disc_cost_fn


def _fake_mnist_batches(n_stacks):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(size=(n_stacks, K, BS, 784)).astype("f4"))


@pytest.mark.parametrize("mode", ["wgan-CT", "wgan", "dcgan"])
def test_train_steps_run_and_stay_finite(mode):
    state, step_fn, sample_fn, _ = _build(mode)
    jit_step = jax.jit(step_fn, donate_argnums=0)
    batches = _fake_mnist_batches(3)
    key = jax.random.PRNGKey(42)
    for i in range(3):
        state, metrics = jit_step(state, batches[i], key)
        assert np.isfinite(float(metrics["disc_cost"])), (mode, i)
        assert np.isfinite(float(metrics["gen_cost"]))
    assert int(state.step) == 3
    if mode == "wgan-CT":
        assert np.isfinite(float(metrics["ct"]))
        assert np.isfinite(float(metrics["gp"]))
    if mode == "wgan":
        # weight clipping applied
        for k, v in state.disc_params.items():
            assert float(jnp.abs(v).max()) <= 0.01 + 1e-6


def test_gen_update_skipped_at_step0():
    state, step_fn, _, _ = _build()
    g0 = {k: np.asarray(v) for k, v in state.gen_params.items()}
    d0 = {k: np.asarray(v) for k, v in state.disc_params.items()}
    batches = _fake_mnist_batches(2)
    jit_step = jax.jit(step_fn)
    state1, _ = jit_step(state, batches[0], jax.random.PRNGKey(0))
    # G unchanged at iteration 0 (CT_gan_cifar.py:192), D changed
    for k in g0:
        np.testing.assert_array_equal(np.asarray(state1.gen_params[k]), g0[k])
    assert any(
        not np.array_equal(np.asarray(state1.disc_params[k]), d0[k]) for k in d0
    )
    state2, _ = jit_step(state1, batches[1], jax.random.PRNGKey(0))
    assert any(
        not np.array_equal(np.asarray(state2.gen_params[k]), g0[k]) for k in g0
    )


def test_sample_fn_deterministic_for_fixed_noise():
    state, _, sample_fn, _ = _build()
    noise = jnp.asarray(np.random.default_rng(1).normal(size=(4, 128)).astype("f4"))
    a = np.asarray(sample_fn(state, noise, jax.random.PRNGKey(0)))
    b = np.asarray(sample_fn(state, noise, jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 784)


def test_optimizers_match_reference_math():
    """TF Adam vs a NumPy reimplementation for 3 steps."""
    p = {"w": jnp.asarray([1.0, -2.0])}
    opt = optim.adam(0.1, 0.5, 0.9)
    state = opt.init(p)
    g = {"w": jnp.asarray([0.5, 0.5])}
    np_p = np.array([1.0, -2.0])
    m = np.zeros(2); v = np.zeros(2)
    for t in range(1, 4):
        p, state = opt.update(g, state, p, 0)
        m = 0.5 * m + 0.5 * 0.5
        v = 0.9 * v + 0.1 * 0.25
        lr_t = 0.1 * np.sqrt(1 - 0.9**t) / (1 - 0.5**t)
        np_p = np_p - lr_t * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(p["w"]), np_p, rtol=1e-5)


def test_theano_adam_math():
    p = {"w": jnp.asarray([1.0])}
    opt = optim.adam_theano(0.003, 0.5)
    state = opt.init(p)
    g = {"w": jnp.asarray([2.0])}
    p1, state = opt.update(g, state, p, 0)
    # t=1: m=1.0, v=0.002*4=... mom2=0.999: v=0.001*4=0.004
    m_hat = (0.5 * 0 + 0.5 * 2.0) / (1 - 0.5)
    v_hat = (0.001 * 4.0) / (1 - 0.999)
    gold = 1.0 - 0.003 * m_hat / np.sqrt(v_hat + 1e-8)
    np.testing.assert_allclose(np.asarray(p1["w"]), [gold], rtol=1e-5)


def test_grad_clip_transforms():
    g = {"a": jnp.asarray([3.0, -4.0])}
    clipped = optim.clip_grads_by_value(g, 1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [1.0, -1.0])
    clipped2, norm = optim.clip_grads_by_global_norm(g, 1.0)
    assert np.isclose(float(norm), 5.0)
    np.testing.assert_allclose(np.asarray(clipped2["a"]), [0.6, -0.8], rtol=1e-6)


def test_linear_decay_schedule():
    from ctgan_tpu.train.schedules import linear_decay

    s = linear_decay(2e-4, 100)
    assert np.isclose(float(s(0)), 2e-4)
    assert np.isclose(float(s(50)), 1e-4)
    assert float(s(200)) == 0.0
