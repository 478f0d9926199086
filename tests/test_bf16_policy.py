"""bf16 numerics path (the TPU policy) exercised on CPU.

Ensures the bandwidth-optimized activation dtype plumbing — bf16 conv/matmul
returns, dtype-preserving bias adds, fp32 loss upcasts — composes through the
full fused train step including the GP double backward.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctgan_tpu.core import (
    default_tpu_policy,
    init_context,
    precision_policy,
    rng_context,
    split_params,
)
from ctgan_tpu.models import dcgan
from ctgan_tpu.train import GanConfig, make_gan_trainer


@pytest.fixture(autouse=True)
def _bf16_policy():
    default_tpu_policy(enable_bf16=True)
    yield
    default_tpu_policy(enable_bf16=False)


def test_ops_return_bf16_activations():
    from ctgan_tpu.ops import conv2d, linear

    x = jnp.ones((2, 8, 8, 3))
    with init_context(seed=0):
        y = conv2d("C", 3, 4, 3, x)
        z = linear("L", 4, 2, jnp.ones((2, 4)))
    assert y.dtype == jnp.bfloat16
    assert z.dtype == jnp.bfloat16


def test_precision_policy_override_restores_fp32():
    from ctgan_tpu.ops import linear

    with init_context(seed=0):
        with precision_policy(jnp.float32):
            z = linear("L", 4, 2, jnp.ones((2, 4)))
    assert z.dtype == jnp.float32


def test_bf16_train_steps_finite_and_losses_fp32():
    gen_fn = partial(dcgan.mnist_generator, dim=8)
    disc_fn = partial(dcgan.mnist_discriminator, dim=8)
    cfg = GanConfig(batch_size=8, critic_iters=2)
    init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            disc_fn(gen_fn(2))
    gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
    state = init_state(gp, dp)
    batch = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 8, 784)).astype("f4"))
    jit_step = jax.jit(step_fn, donate_argnums=0)
    gp0 = None
    for i in range(4):
        state, m = jit_step(state, batch, jax.random.PRNGKey(0))
        assert m["disc_cost"].dtype == jnp.float32  # losses reduced in fp32
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, i)
        if gp0 is None:
            gp0 = float(m["gp"])
    # GP must be actively decreasing under training even in bf16
    assert float(m["gp"]) < gp0
    # params remain fp32
    assert all(v.dtype == jnp.float32 for v in state.disc_params.values())
