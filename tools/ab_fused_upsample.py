"""A/B the fused upsample+conv generator path on the flagship step.

Measures the full ACGAN training iteration with blocks.FUSE_UPSAMPLE_CONV
on vs off (identical params/math — ops.upsample_conv2d docstring) and
prints one JSON line per arm.

    python tools/ab_fused_upsample.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctgan_tpu.core import default_tpu_policy, init_context, rng_context, split_params
    from ctgan_tpu.data import DeviceSampler
    from ctgan_tpu.data.synthetic import synthetic_cifar10
    from ctgan_tpu.models import blocks, resnet_cifar
    from ctgan_tpu.ops.dropout import enable_pallas_dropout
    from ctgan_tpu.train.trainer_acgan import AcganConfig, make_acgan_trainer

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu)
    enable_pallas_dropout(on_tpu)

    B, K, DIM = args.batch, 5, args.dim
    (tx, ty), _ = synthetic_cifar10(n_train=B * K * 4)
    results = {}
    for fused in (True, False):
        blocks.FUSE_UPSAMPLE_CONV = fused
        mcfg = resnet_cifar.ResnetCifarConfig(dim_g=DIM, dim_d=DIM)
        gen_fn = lambda n, labels, noise=None: resnet_cifar.generator(
            n, labels, noise=noise, cfg=mcfg
        )
        disc_fn = lambda x, labels, k1, k2, k3: resnet_cifar.discriminator(
            x, labels, k1, k2, k3, mcfg
        )
        cfg = AcganConfig(batch_size=B, critic_iters=K)
        init_state, step_fn, *_ = make_acgan_trainer(gen_fn, disc_fn, cfg)
        with init_context(seed=0) as ctx:
            with rng_context(jax.random.PRNGKey(0)):
                labels = jnp.zeros((2,), jnp.int32)
                disc_fn(gen_fn(2, labels), labels, 0.8, 0.5, 0.5)
        gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
        state = init_state(gp, dp)
        sampler = DeviceSampler([tx.astype("uint8"), ty.astype("int32")], B, K)
        data_args = tuple(sampler.arrays)

        def full_step(state, i, data, key):
            rs, ls = sampler.sample(i, data)
            return step_fn(state, rs, ls, key)

        # scan-window-difference timing (see bench.py)
        def multi(state, data, key, k):
            def body(carry, i):
                rs, ls = sampler.sample(i, data)
                carry, m = step_fn(carry, rs, ls, key)
                return carry, m["disc_cost"]

            return jax.lax.scan(body, state, jnp.arange(k))

        jit_multi = jax.jit(multi, static_argnums=3, donate_argnums=0)
        key = jax.random.PRNGKey(0)
        k1, k2 = args.iters, args.iters * 5
        state, costs = jit_multi(state, data_args, key, k1)
        float(costs[-1])
        state, costs = jit_multi(state, data_args, key, k2)
        float(costs[-1])
        t0 = time.perf_counter()
        state, costs = jit_multi(state, data_args, key, k1)
        float(costs[-1])
        t_k1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, costs = jit_multi(state, data_args, key, k2)
        m = {"disc_cost": costs[-1]}
        float(costs[-1])
        t_k2 = time.perf_counter() - t0
        sec = (t_k2 - t_k1) / (k2 - k1)
        results[fused] = sec
        print(json.dumps({
            "arm": "fused" if fused else "naive",
            "sec_per_iter": round(sec, 4),
            "images_per_sec": round(B * K / sec, 1),
            "disc_cost": float(np.asarray(m["disc_cost"])),
        }), flush=True)
    print(json.dumps({
        "speedup_fused_vs_naive": round(results[False] / results[True], 4)
    }))


if __name__ == "__main__":
    main()
