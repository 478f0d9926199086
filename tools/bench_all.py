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
    """Scan-window-difference timing (see bench.py): K iterations inside one
    jitted lax.scan, two window sizes, difference cancels dispatch/readback
    overhead — the only methodology that survives this tunneled runtime
    (end-block under-waits on donated buffers; eager per-iter ops pay ~1.4s
    relay round trips)."""
    import jax
    import jax.numpy as jnp

    state = init_state()
    batch = make_batch(0)
    key = jax.random.PRNGKey(0)

    def multi(state, batch, key, k):
        def body(carry, _):
            carry, m = step_fn(carry, *batch, key)
            return carry, m["disc_cost"]

        return jax.lax.scan(body, state, jnp.arange(k))

    jit_multi = jax.jit(multi, static_argnums=3, donate_argnums=0)
    k1, k2 = max(2, iters // 2), iters * 2
    t0 = time.perf_counter()
    state, costs = jit_multi(state, batch, key, k1)
    float(costs[-1])
    state, costs = jit_multi(state, batch, key, k2)
    float(costs[-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, costs = jit_multi(state, batch, key, k1)
    float(costs[-1])
    t_k1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, costs = jit_multi(state, batch, key, k2)
    final_cost = float(costs[-1])
    t_k2 = time.perf_counter() - t0
    sec = (t_k2 - t_k1) / (k2 - k1)
    print(json.dumps({
        "workload": name,
        "sec_per_iter": round(sec, 4),
        "images_per_sec": round(batch_size * critic_iters / sec, 1),
        "compile_sec": round(compile_s, 1),
        "disc_cost": final_cost,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="mnist,cifar,resnet,good64,lsun128")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true", help="tiny dims (CPU smoke)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU may be busy; the "
                    "sitecustomize-registered axon backend ignores "
                    "JAX_PLATFORMS, so this must flip jax.config before "
                    "backend init)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

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
    if "io64" in wl:
        # Input-path comparison on the 64x64 workload: HBM-resident
        # DeviceSampler (selection in-step, zero host transfer) vs the
        # native C++ BatchPipeline (host-threaded decode/flip/normalize +
        # per-iteration host->device feed) — quantifies whether the native
        # pipeline keeps a real device step fed.
        from ctgan_tpu.data import DeviceSampler
        from ctgan_tpu.data.native import NativePipeline, native_available

        dim, batch, k = (8, 4, 2) if t else (64, 64, 5)
        out_dim = 64 * 64 * 3
        n = 256 if t else 4096
        images = rng.integers(0, 256, size=(n, out_dim), dtype=np.uint8)
        gen_fn = partial(good64.good64_generator, dim=dim)
        disc_fn = lambda x: good64.good64_discriminator(x, dim)
        cfg = GanConfig(batch_size=batch, critic_iters=k)
        init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
        with init_context(seed=0) as ctx:
            with rng_context(jax.random.PRNGKey(0)):
                disc_fn(gen_fn(2))
        gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
        key = jax.random.PRNGKey(0)

        def run_path(name, next_stack, in_jit_dequant):
            if in_jit_dequant:
                def step(state, raw, key):
                    real = 2.0 * (raw.astype(jnp.float32) / 255.0 - 0.5)
                    return step_fn(state, real, key)
            else:
                step = step_fn
            jit_step = jax.jit(step, donate_argnums=0)
            # fresh buffers per path: donate_argnums=0 consumes them
            state = init_state(
                jax.tree.map(lambda x: x.copy(), gp),
                jax.tree.map(lambda x: x.copy(), dp),
            )
            state, m = jit_step(state, next_stack(0), key)
            float(m["disc_cost"])
            state, m = jit_step(state, next_stack(1), key)
            float(m["disc_cost"])
            # per-iteration value fetch: the native path needs a host batch
            # every iteration, so scan-window timing doesn't apply; both
            # arms pay identical per-iter readback overhead, keeping the
            # input-path COMPARISON fair (absolute numbers include ~1 relay
            # round trip per iteration on tunneled devices)
            t0 = time.perf_counter()
            data_s = 0.0
            for i in range(2, 2 + args.iters):
                td = time.perf_counter()
                stack = next_stack(i)
                data_s += time.perf_counter() - td
                state, m = jit_step(state, stack, key)
                float(m["disc_cost"])
            sec = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "workload": name,
                "sec_per_iter": round(sec, 4),
                "images_per_sec": round(batch * k / sec, 1),
                "data_sec_per_iter": round(data_s / args.iters, 4),
                "disc_cost": float(m["disc_cost"]),
            }), flush=True)

        sampler = DeviceSampler([images.astype("int32")], batch, k)
        data_args = tuple(sampler.arrays)
        run_path(
            "good64_input_device_sampler",
            lambda i: sampler.sample(jnp.asarray(i), data_args, sampler.host_perm(i)),
            in_jit_dequant=True,
        )
        if native_available():
            pipe = NativePipeline(
                images, None, batch, k, chw=(3, 64, 64), flip=True,
                scale=2.0 / 255.0, shift=-1.0, n_threads=2,
            )
            try:
                run_path(
                    "good64_input_native_pipeline",
                    lambda i: jnp.asarray(pipe.next()[0]),
                    in_jit_dequant=False,
                )
            finally:
                pipe.close()
        else:
            print(json.dumps({"workload": "good64_input_native_pipeline",
                              "error": "native library unavailable"}))
    if "lsun128" in wl:
        mcfg = (
            lsun128.Lsun128Config(dim_g_4=32, dim_g_8=16, dim_g_16=16, dim_g_32=8,
                                  dim_g_64=8, dim_d_64=8, dim_d_32=16, dim_d_16=16,
                                  dim_d_8=32)
            if t else lsun128.Lsun128Config()
        )
        # remat=False: jax.checkpoint of the closure-param disc_fn leaks a
        # LinearizeTracer under the scan-timing wrapper (ROADMAP #4); the
        # un-rematted step fits v5e HBM at this batch size anyway
        gan_workload(
            "lsun128_ctgan",
            lambda n, noise=None: lsun128.lsun128_generator(n, noise=noise, cfg=mcfg),
            lambda x: lsun128.lsun128_discriminator(x, 0.8, 0.5, 0.5, mcfg),
            3 * 128 * 128, 2 if t else 16, k=2 if t else 5,
        )


if __name__ == "__main__":
    main()
