"""CT-GAN on CIFAR-10, conv G/D (rebuild of CT_gan_cifar.py).

1000-example subset by default; Inception Score every 1000 iterations
(trained-classifier scorer); slope-on-real monitor + discriminator param
dump every 100 iterations, like the reference (:215-230).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import apply_context, init_context, rng_context, split_params
from ..data import DeviceSampler, cifar10
from ..losses.gan import input_slopes
from ..models import dcgan
from ..train import GanConfig, LoopConfig, make_gan_trainer, train_loop
from ..utils import MetricLogger, save_checkpoint
from .common import pick_scorer, parse_config, save_sample_grid, setup_out_dir


@dataclass(frozen=True)
class Config:
    MODE: str = "wgan-CT"
    DIM: int = 128               # CT_gan_cifar.py:38 ("this overfits...")
    BATCH_SIZE: int = 64
    CRITIC_ITERS: int = 5
    LAMBDA: float = 10.0
    LAMBDA_2: float = 2.0
    Factor_M: float = 0.0
    ITERS: int = 50000
    n_examples: int = 1000
    DATA_DIR: str = ""
    seed: int = 0
    allow_fresh_start: bool = False  # train from scratch in an out_dir whose
                                     # log.pkl shows progress (utils/resume.py)
    out_dir: str = "runs/ct_gan_cifar"
    inception_every: int = 1000  # (:210)
    inception_samples: int = 1000
    sample_every: int = 100
    save_every: int = 1000
    BF16: bool = True            # bf16 conv/matmul compute on TPU
    PALLAS_DROPOUT: bool = True  # on-core PRNG dropout kernel on TPU


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse_config(Config, argv)
    out_dir = setup_out_dir(cfg)

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu and cfg.BF16:
        from ctgan_tpu.core import default_tpu_policy

        default_tpu_policy(enable_bf16=True)
    if on_tpu and cfg.PALLAS_DROPOUT:
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)

    gen_fn = partial(dcgan.cifar_generator, dim=cfg.DIM)
    disc_fn = partial(dcgan.cifar_discriminator, dim=cfg.DIM, mode=cfg.MODE)
    gcfg = GanConfig(
        mode=cfg.MODE, batch_size=cfg.BATCH_SIZE, critic_iters=cfg.CRITIC_ITERS,
        lambda_gp=cfg.LAMBDA, lambda_ct=cfg.LAMBDA_2, factor_m=cfg.Factor_M,
        iters=cfg.ITERS,
    )
    init_state, step_fn, sample_fn, disc_cost_fn = make_gan_trainer(gen_fn, disc_fn, gcfg)
    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(cfg.seed)):
            disc_fn(gen_fn(2))
    gparams, dparams, rest = split_params(ctx.params, "Generator", "Discriminator")
    assert not rest
    state = init_state(gparams, dparams)

    data = cifar10.load_arrays(cfg.DATA_DIR or None, n_examples=cfg.n_examples)
    full = cifar10.load_arrays(cfg.DATA_DIR or None)
    sampler = DeviceSampler(
        [data["train"][0].astype("uint8")], cfg.BATCH_SIZE, cfg.CRITIC_ITERS,
        seed=cfg.seed,
    )
    dev_images = data["test"][0][: cfg.BATCH_SIZE * 10]

    # scorer: Inception-2015 when weights are supplied, else train-once cache
    scorer = pick_scorer(3, 32, out_dir, train_data=full["train"])
    if getattr(scorer, "comparable", False) is False and hasattr(scorer, "sanity_check"):
        print("scorer test acc:", scorer.sanity_check(full["test"][0][:2000], full["test"][1][:2000]))

    fixed_noise = jnp.asarray(
        np.random.default_rng(cfg.seed).normal(size=(128, 128)).astype("f4")
    )
    logger = MetricLogger(out_dir)
    jit_sample = jax.jit(sample_fn)
    jit_dev_cost = jax.jit(disc_cost_fn)

    def slopes_on(state, images_int):
        real = 2.0 * (jnp.asarray(images_int, jnp.float32) / 255.0 - 0.5)

        def monitor(x):
            with rng_context({"default": jax.random.PRNGKey(0)}):
                with apply_context(state.disc_params):
                    return input_slopes(disc_fn, x)

        return jax.jit(monitor)(real)

    def dequant_step(state, step_idx, data, perm, key):
        raw = sampler.sample(step_idx, data, perm)
        real = 2.0 * (raw.astype(jnp.float32) / 255.0 - 0.5)
        return step_fn(state, real, key)

    counter = {"i": 0}
    data_args = tuple(sampler.arrays)

    def next_batch():
        i = counter["i"]
        counter["i"] += 1
        return (jnp.asarray(i), data_args, sampler.host_perm(i))

    def generate_samples(state, n):
        outs = []
        for i in range(0, n, 100):
            noise = jax.random.normal(jax.random.PRNGKey(1000 + i), (100, 128))
            outs.append(np.asarray(jit_sample(state, noise, jax.random.PRNGKey(i))))
        flat = np.concatenate(outs)[:n]
        return ((flat + 1.0) * (255.0 / 2)).astype("int32")

    def test_fn(state, iteration):
        metrics = {}
        # dev cost + slope monitor every sample_every (reference :215-230)
        costs = [
            float(jit_dev_cost(
                state,
                2.0 * (jnp.asarray(dev_images[i : i + cfg.BATCH_SIZE], jnp.float32) / 255.0 - 0.5),
                jax.random.PRNGKey(i),
            ))
            for i in range(0, len(dev_images), cfg.BATCH_SIZE)
        ]
        metrics["dev disc cost"] = float(np.mean(costs))
        metrics["slope_real"] = float(np.max(np.asarray(
            slopes_on(state, dev_images[: cfg.BATCH_SIZE])
        )))
        # disc param dump (np.save("param.pyn"), reference :222)
        save_checkpoint(f"{out_dir}/disc_params.npz", state.disc_params)
        samples = jit_sample(state, fixed_noise, jax.random.PRNGKey(0))
        save_sample_grid(samples, (3, 32, 32), f"{out_dir}/samples_{iteration}.jpg")
        if cfg.inception_every and iteration % cfg.inception_every == cfg.inception_every - 1:
            is_mean, is_std = scorer.inception_score(generate_samples(state, cfg.inception_samples))
            metrics["inception score"] = is_mean
        return metrics

    lcfg = LoopConfig(
        iters=cfg.ITERS, print_every=100, test_every=cfg.sample_every,
        save_every=cfg.save_every, ckpt_dir=f"{out_dir}/ckpt",
        allow_fresh_start=cfg.allow_fresh_start,
    )
    state = train_loop(
        state, dequant_step, next_batch, jax.random.PRNGKey(cfg.seed), lcfg,
        logger=logger, test_fn=test_fn,
        data_state=lambda: {"i": counter["i"]},
        set_data_state=lambda s: counter.update(i=int(s["i"])),
    )
    return state


if __name__ == "__main__":
    main()
