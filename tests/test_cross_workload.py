"""Cross-workload isolation: two different trainers in ONE process.

Round-2's bench_all failed with an UnexpectedTracerError when workloads
shared a process: ``jax.checkpoint`` of a discriminator that reads weights
from the ambient apply_context cached its jaxpr with the context's tracers
as constants, and the cache outlives the trace (ROADMAP r2 #4).  The fix
(train/remat.py) threads params + RNG key through the checkpoint boundary;
these tests run back-to-back trainers under jax.check_tracer_leaks.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

slow = pytest.mark.slow

from ctgan_tpu.core import init_context, rng_context, split_params
from ctgan_tpu.models import dcgan, lsun128
from ctgan_tpu.train import GanConfig, make_gan_trainer


def _run_workload(gen_fn, disc_fn, out_dim, batch, k, n_scan=2, **gan_kw):
    cfg = GanConfig(batch_size=batch, critic_iters=k, **gan_kw)
    init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            disc_fn(gen_fn(2))
    gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(-1, 1, size=(k, batch, out_dim)).astype("f4"))
    state = init_state(gp, dp)

    def multi(state, batch, key, n):
        def body(carry, _):
            carry, m = step_fn(carry, *batch, key)
            return carry, m["disc_cost"]

        return jax.lax.scan(body, state, jnp.arange(n))

    jm = jax.jit(multi, static_argnums=3, donate_argnums=0)
    state, costs = jm(state, (data,), jax.random.PRNGKey(0), n_scan)
    return float(costs[-1])


def test_two_trainers_one_process_no_tracer_leak():
    """cifar (no remat) then a tiny lsun128 WITH remat, leak checker on:
    the exact shape of the round-2 bench_all failure."""
    with jax.check_tracer_leaks():
        c1 = _run_workload(
            partial(dcgan.cifar_generator, dim=8),
            partial(dcgan.cifar_discriminator, dim=8),
            3072, 4, 2,
        )
        mcfg = lsun128.Lsun128Config(
            dim_g_4=16, dim_g_8=8, dim_g_16=8, dim_g_32=8, dim_g_64=8,
            dim_d_64=8, dim_d_32=8, dim_d_16=8, dim_d_8=16,
        )
        c2 = _run_workload(
            lambda n, noise=None: lsun128.lsun128_generator(n, noise=noise, cfg=mcfg),
            lambda x: lsun128.lsun128_discriminator(x, 0.8, 0.5, 0.5, mcfg),
            3 * 128 * 128, 2, 1, remat=True,
        )
    assert np.isfinite(c1) and np.isfinite(c2)


@slow
def test_remat_step_is_finite_and_retraceable():
    """Same remat'd trainer traced TWICE (two scan lengths): the cached
    checkpoint jaxpr must be safely reusable across traces."""
    mcfg = lsun128.Lsun128Config(
        dim_g_4=16, dim_g_8=8, dim_g_16=8, dim_g_32=8, dim_g_64=8,
        dim_d_64=8, dim_d_32=8, dim_d_16=8, dim_d_8=16,
    )
    gen_fn = lambda n, noise=None: lsun128.lsun128_generator(n, noise=noise, cfg=mcfg)
    disc_fn = lambda x: lsun128.lsun128_discriminator(x, 0.8, 0.5, 0.5, mcfg)
    with jax.check_tracer_leaks():
        c1 = _run_workload(gen_fn, disc_fn, 3 * 128 * 128, 2, 1, n_scan=1, remat=True)
        c2 = _run_workload(gen_fn, disc_fn, 3 * 128 * 128, 2, 1, n_scan=2, remat=True)
    assert np.isfinite(c1) and np.isfinite(c2)
