"""CT-GAN on MNIST (rebuild of CT_gan_mnist.py).

Modes dcgan / wgan / wgan-CT; 1000-example training subset; samples + dev
cost every 100 iterations.  Usage::

    python -m ctgan_tpu.apps.ct_gan_mnist --MODE wgan-CT --ITERS 50000
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import init_context, rng_context, split_params
from ..data import DeviceSampler, mnist
from ..models import dcgan
from ..train import GanConfig, LoopConfig, make_gan_trainer, train_loop
from ..utils import MetricLogger
from .common import parse_config, save_sample_grid, setup_out_dir


@dataclass(frozen=True)
class Config:
    MODE: str = "wgan-CT"        # dcgan | wgan | wgan-CT (CT_gan_mnist.py:29)
    DIM: int = 64
    BATCH_SIZE: int = 50
    CRITIC_ITERS: int = 5
    LAMBDA: float = 10.0
    LAMBDA_2: float = 2.0
    Factor_M: float = 0.0
    ITERS: int = 50000
    n_examples: int = 1000
    seed: int = 0
    allow_fresh_start: bool = False  # train from scratch in an out_dir whose
                                     # log.pkl shows progress (utils/resume.py)
    out_dir: str = "runs/ct_gan_mnist"
    save_every: int = 1000
    sample_every: int = 100
    BF16: bool = True            # bf16 conv/matmul compute on TPU
    PALLAS_DROPOUT: bool = True  # on-core PRNG dropout kernel on TPU


def build(cfg: Config):
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu and cfg.BF16:
        from ctgan_tpu.core import default_tpu_policy

        default_tpu_policy(enable_bf16=True)
    if on_tpu and cfg.PALLAS_DROPOUT:
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)
    gen_fn = partial(dcgan.mnist_generator, dim=cfg.DIM, mode=cfg.MODE)
    disc_fn = partial(dcgan.mnist_discriminator, dim=cfg.DIM, mode=cfg.MODE)
    critic_iters = 1 if cfg.MODE == "dcgan" else cfg.CRITIC_ITERS
    gcfg = GanConfig(
        mode=cfg.MODE, batch_size=cfg.BATCH_SIZE, critic_iters=critic_iters,
        lambda_gp=cfg.LAMBDA, lambda_ct=cfg.LAMBDA_2, factor_m=cfg.Factor_M,
        iters=cfg.ITERS,
    )
    init_state, step_fn, sample_fn, disc_cost_fn = make_gan_trainer(gen_fn, disc_fn, gcfg)
    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(cfg.seed)):
            disc_fn(gen_fn(2))
    gp, dp, rest = split_params(ctx.params, "Generator", "Discriminator")
    assert not rest
    return init_state(gp, dp), step_fn, sample_fn, disc_cost_fn, critic_iters


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse_config(Config, argv)
    out_dir = setup_out_dir(cfg)
    state, step_fn, sample_fn, disc_cost_fn, critic_iters = build(cfg)

    data = mnist.load_arrays(n_examples=cfg.n_examples)
    sampler = DeviceSampler(
        [data["train"][0]], cfg.BATCH_SIZE, critic_iters, seed=cfg.seed
    )
    dev_images = jnp.asarray(data["dev"][0][: cfg.BATCH_SIZE * 10])
    fixed_noise = jnp.asarray(
        np.random.default_rng(cfg.seed).normal(size=(128, 128)).astype("f4")
    )
    logger = MetricLogger(out_dir)
    jit_dev_cost = jax.jit(disc_cost_fn)

    def fused_step(state, step_idx, data, perm, key):
        return step_fn(state, sampler.sample(step_idx, data, perm), key)

    counter = {"i": 0}
    data_args = tuple(sampler.arrays)

    def next_batch():
        i = counter["i"]
        counter["i"] += 1
        return (jnp.asarray(i), data_args, sampler.host_perm(i))

    def test_fn(state, iteration):
        costs = [
            float(jit_dev_cost(state, dev_images[i : i + cfg.BATCH_SIZE], jax.random.PRNGKey(i)))
            for i in range(0, len(dev_images), cfg.BATCH_SIZE)
        ]
        samples = sample_fn(state, fixed_noise, jax.random.PRNGKey(0))
        save_sample_grid(samples, (1, 28, 28), f"{out_dir}/samples_{iteration}.png",
                         value_range=(0.0, 1.0))
        return {"dev disc cost": float(np.mean(costs))}

    lcfg = LoopConfig(
        iters=cfg.ITERS, print_every=100, test_every=cfg.sample_every,
        save_every=cfg.save_every, ckpt_dir=f"{out_dir}/ckpt",
        allow_fresh_start=cfg.allow_fresh_start,
    )
    state = train_loop(
        state, fused_step, next_batch, jax.random.PRNGKey(cfg.seed), lcfg,
        logger=logger, test_fn=test_fn,
        data_state=lambda: {"i": counter["i"]},
        set_data_state=lambda s: counter.update(i=int(s["i"])),
    )
    return state


if __name__ == "__main__":
    main()
