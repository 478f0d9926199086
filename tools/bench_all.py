"""Per-workload training throughput harness.

Measures every model family's fused train iteration (G update +
critic_iters D updates with CT+GP) and prints one JSON line per workload.
``bench.py`` stays the single-line flagship benchmark for the driver; this
tool gives the full performance picture.

    python tools/bench_all.py [--workloads mnist,cifar,resnet,good64,lsun128]
                              [--iters 10] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def _measure(name, init_state, step_fn, make_batch, batch_size, critic_iters, iters):
    import jax
    import jax.numpy as jnp

    state = init_state()
    jit_step = jax.jit(step_fn, donate_argnums=0)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = jit_step(state, *make_batch(0), key)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0
    state, metrics = jit_step(state, *make_batch(1), key)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for i in range(2, 2 + iters):
        state, metrics = jit_step(state, *make_batch(i), key)
    jax.block_until_ready(metrics)
    sec = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "workload": name,
        "sec_per_iter": round(sec, 4),
        "images_per_sec": round(batch_size * critic_iters / sec, 1),
        "compile_sec": round(compile_s, 1),
        "disc_cost": float(metrics["disc_cost"]),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="mnist,cifar,resnet,good64,lsun128")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true", help="tiny dims (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctgan_tpu.core import default_tpu_policy, init_context, rng_context, split_params
    from ctgan_tpu.models import dcgan, good64, lsun128, resnet_cifar
    from ctgan_tpu.train import GanConfig, make_gan_trainer
    from ctgan_tpu.train.trainer_acgan import AcganConfig, make_acgan_trainer

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu)
    if on_tpu:
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)

    rng = np.random.default_rng(0)
    t = args.tiny

    def gan_workload(name, gen_fn, disc_fn, out_dim, batch, k=5, **gan_kw):
        cfg = GanConfig(batch_size=batch, critic_iters=k, **gan_kw)
        init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
        with init_context(seed=0) as ctx:
            with rng_context(jax.random.PRNGKey(0)):
                disc_fn(gen_fn(2))
        gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
        data = jnp.asarray(rng.uniform(-1, 1, size=(k, batch, out_dim)).astype("f4"))
        _measure(
            name, lambda: init_state(gp, dp), step_fn, lambda i: (data,),
            batch, k, args.iters,
        )

    wl = set(args.workloads.split(","))
    if "mnist" in wl:
        dim = 8 if t else 64
        gan_workload(
            "mnist_ctgan",
            partial(dcgan.mnist_generator, dim=dim),
            partial(dcgan.mnist_discriminator, dim=dim),
            784, 8 if t else 50,
        )
    if "cifar" in wl:
        dim = 8 if t else 128
        gan_workload(
            "cifar_conv_ctgan",
            partial(dcgan.cifar_generator, dim=dim),
            partial(dcgan.cifar_discriminator, dim=dim),
            3072, 8 if t else 64,
        )
    if "resnet" in wl:
        dim = 8 if t else 128
        batch = 8 if t else 64
        mcfg = resnet_cifar.ResnetCifarConfig(dim_g=dim, dim_d=dim)
        cfg = AcganConfig(batch_size=batch, critic_iters=5)
        init_state, step_fn, _, _, _ = make_acgan_trainer(
            lambda n, labels, noise=None: resnet_cifar.generator(n, labels, noise=noise, cfg=mcfg),
            lambda x, labels, k1, k2, k3: resnet_cifar.discriminator(x, labels, k1, k2, k3, mcfg),
            cfg,
        )
        with init_context(seed=0) as ctx:
            with rng_context(jax.random.PRNGKey(0)):
                labels = jnp.zeros((2,), jnp.int32)
                resnet_cifar.discriminator(
                    resnet_cifar.generator(2, labels, cfg=mcfg), labels, 0.8, 0.5, 0.5, mcfg
                )
        gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
        reals = jnp.asarray(rng.integers(0, 256, size=(5, batch, 3072)), jnp.int32)
        labs = jnp.asarray(rng.integers(0, 10, size=(5, batch)), jnp.int32)
        _measure(
            "cifar_resnet_acgan_ctgan", lambda: init_state(gp, dp), step_fn,
            lambda i: (reals, labs), batch, 5, args.iters,
        )
    if "good64" in wl:
        dim = 8 if t else 64
        gan_workload(
            "good64_ctgan",
            partial(good64.good64_generator, dim=dim),
            lambda x: good64.good64_discriminator(x, dim),
            64 * 64 * 3, 4 if t else 64, k=2 if t else 5,
        )
    if "lsun128" in wl:
        mcfg = (
            lsun128.Lsun128Config(dim_g_4=32, dim_g_8=16, dim_g_16=16, dim_g_32=8,
                                  dim_g_64=8, dim_d_64=8, dim_d_32=16, dim_d_16=16,
                                  dim_d_8=32)
            if t else lsun128.Lsun128Config()
        )
        gan_workload(
            "lsun128_ctgan",
            lambda n, noise=None: lsun128.lsun128_generator(n, noise=noise, cfg=mcfg),
            lambda x: lsun128.lsun128_discriminator(x, 0.8, 0.5, 0.5, mcfg),
            3 * 128 * 128, 2 if t else 32, k=2 if t else 5,
            remat=not t,
        )


if __name__ == "__main__":
    main()
