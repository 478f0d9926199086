"""Shared workload builders for the perf tools.

One place that constructs every model family's fused train iteration
(G update + critic_iters D updates with CT+GP) exactly as the apps do, so
``bench_all.py`` (throughput), ``cost_analysis.py`` (roofline accounting),
and A/B harnesses measure the SAME program.

Each builder returns a ``Workload`` with an ``init_state`` thunk, the fused
``step_fn(state, *batch, key)``, a ``make_batch(i)`` thunk, and the nominal
(batch_size, critic_iters) for images/sec accounting.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

sys.path.insert(0, ".")

from ctgan_tpu.utils import enable_compilation_cache

# Tool runs pay the same heavy compiles as the apps; share their cache.
enable_compilation_cache()

WORKLOADS = ("mnist", "cifar", "resnet", "good64", "lsun128")


@dataclass
class Workload:
    name: str
    init_state: Callable[[], object]
    step_fn: Callable
    make_batch: Callable[[int], tuple]
    batch_size: int
    critic_iters: int
    meta: dict = field(default_factory=dict)


def _gan_workload(name, gen_fn, disc_fn, out_dim, batch, k=5, **gan_kw):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctgan_tpu.core import init_context, rng_context, split_params
    from ctgan_tpu.train import GanConfig, make_gan_trainer

    cfg = GanConfig(batch_size=batch, critic_iters=k, **gan_kw)
    init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            disc_fn(gen_fn(2))
    gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(-1, 1, size=(k, batch, out_dim)).astype("f4"))
    return Workload(
        name,
        lambda: init_state(
            jax.tree.map(lambda x: x.copy(), gp),
            jax.tree.map(lambda x: x.copy(), dp),
        ),
        step_fn,
        lambda i: (data,),
        batch,
        k,
    )


def build_workload(which: str, tiny: bool = False, **overrides) -> Workload:
    """Build one named workload.  ``overrides`` reach the GanConfig (e.g.
    ``remat=True``) for the gan-family workloads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctgan_tpu.models import dcgan, good64, lsun128, resnet_cifar

    t = tiny
    if which == "mnist":
        dim = 8 if t else 64
        return _gan_workload(
            "mnist_ctgan",
            partial(dcgan.mnist_generator, dim=dim),
            partial(dcgan.mnist_discriminator, dim=dim),
            784, 8 if t else 50, **overrides,
        )
    if which == "cifar":
        dim = 8 if t else 128
        return _gan_workload(
            "cifar_conv_ctgan",
            partial(dcgan.cifar_generator, dim=dim),
            partial(dcgan.cifar_discriminator, dim=dim),
            3072, 8 if t else 64, **overrides,
        )
    if which == "resnet":
        from ctgan_tpu.core import init_context, rng_context, split_params
        from ctgan_tpu.train.trainer_acgan import AcganConfig, make_acgan_trainer

        dim = 8 if t else 128
        batch = 8 if t else 64
        mcfg = resnet_cifar.ResnetCifarConfig(dim_g=dim, dim_d=dim)
        cfg = AcganConfig(batch_size=batch, critic_iters=5, **overrides)
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
        rng = np.random.default_rng(0)
        reals = jnp.asarray(rng.integers(0, 256, size=(5, batch, 3072)), jnp.int32)
        labs = jnp.asarray(rng.integers(0, 10, size=(5, batch)), jnp.int32)
        return Workload(
            "cifar_resnet_acgan_ctgan",
            lambda: init_state(
                jax.tree.map(lambda x: x.copy(), gp),
                jax.tree.map(lambda x: x.copy(), dp),
            ),
            step_fn,
            lambda i: (reals, labs),
            batch, 5,
        )
    if which == "good64":
        dim = 8 if t else 64
        return _gan_workload(
            "good64_ctgan",
            partial(good64.good64_generator, dim=dim),
            lambda x: good64.good64_discriminator(x, dim),
            64 * 64 * 3, 4 if t else 64, k=2 if t else 5, **overrides,
        )
    if which == "lsun128":
        mcfg = (
            lsun128.Lsun128Config(dim_g_4=32, dim_g_8=16, dim_g_16=16, dim_g_32=8,
                                  dim_g_64=8, dim_d_64=8, dim_d_32=16, dim_d_16=16,
                                  dim_d_8=32)
            if t else lsun128.Lsun128Config()
        )
        return _gan_workload(
            "lsun128_ctgan",
            lambda n, noise=None: lsun128.lsun128_generator(n, noise=noise, cfg=mcfg),
            lambda x: lsun128.lsun128_discriminator(x, 0.8, 0.5, 0.5, mcfg),
            3 * 128 * 128, 2 if t else 16, k=2 if t else 5, **overrides,
        )
    raise ValueError(f"unknown workload {which!r}; known: {WORKLOADS}")
