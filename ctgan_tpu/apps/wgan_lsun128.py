"""128x128 ResNet WGAN-GP+CT (rebuild of wgan_LSUN_Bedrooms128.py).

LSUN-bedrooms/ImageNet-128 directory loader (or synthetic), linear LR decay,
checkpoint every 1000 iterations like the reference's Saver (:367,394-395).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import init_context, rng_context, split_params
from ..models import lsun128
from ..data import images_dir, stack_batches
from ..train import GanConfig, LoopConfig, make_gan_trainer, train_loop
from ..utils import MetricLogger
from .common import parse_config, save_sample_grid, setup_out_dir

OUTPUT_DIM = 3 * 128 * 128


@dataclass(frozen=True)
class Config:
    BATCH_SIZE: int = 64
    CRITIC_ITERS: int = 5
    ITERS: int = 200000
    LAMBDA_2: float = 2.0
    Factor_M: float = 0.0
    LR: float = 1e-4
    DECAY: bool = True
    DIM_G_4: int = 1024
    DIM_D_8: int = 1024
    DATA_DIR: str = ""
    OPT_STATE_DTYPE: str = "float32"  # "bfloat16": Adam moments in bf16
    REMAT: bool = False  # rematerialize the D forward (trades HBM for FLOPs;
                         # measured on v5e it LOSES ~20% wall-clock on the
                         # 64px model and its byte accounting is worse here
                         # too — runs/measure_r3a.log — so default off; turn
                         # on only if the model does not fit)
    input: str = "hbm"   # hbm: DeviceSampler pool + in-step flip/dequant
                         # (zero host feed per iteration); dir: image dir
    BF16: bool = True            # bf16 conv/matmul compute on TPU (the step
                                 # is HBM-byte-bound: 95 GB/iter modeled —
                                 # fp32 activations double that traffic)
    PALLAS_DROPOUT: bool = True  # on-core PRNG dropout kernel on TPU
    FUSE_MEANPOOL: bool = False  # fold conv+mean_pool into ONE stride-2
                                 # conv (exact rewrite).  Chip A/B: 0.0971
                                 # -> 0.0966 s/iter, -0.5% — below the 2%
                                 # adoption bar, stays OFF here
                                 # (runs/queue_r5a.log mpf_ab)
    seed: int = 0
    allow_fresh_start: bool = False  # train from scratch in an out_dir whose
                                     # log.pkl shows progress (utils/resume.py)
    out_dir: str = "runs/wgan_lsun128"
    sample_every: int = 200
    save_every: int = 1000


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

    from ctgan_tpu.models import blocks

    blocks.set_fuse_meanpool(cfg.FUSE_MEANPOOL)

    mcfg = lsun128.Lsun128Config(dim_g_4=cfg.DIM_G_4, dim_d_8=cfg.DIM_D_8)

    def gen_fn(n, noise=None):
        return lsun128.lsun128_generator(n, noise=noise, cfg=mcfg)

    def disc_fn(x):
        return lsun128.lsun128_discriminator(x, 0.8, 0.5, 0.5, mcfg)

    gcfg = GanConfig(
        mode="wgan-CT", batch_size=cfg.BATCH_SIZE, critic_iters=cfg.CRITIC_ITERS,
        lambda_ct=cfg.LAMBDA_2, factor_m=cfg.Factor_M, lr=cfg.LR,
        lr_decay=cfg.DECAY, iters=cfg.ITERS, beta1=0.0, remat=cfg.REMAT,
        opt_state_dtype=cfg.OPT_STATE_DTYPE,
    )
    init_state, step_fn, sample_fn, _ = make_gan_trainer(gen_fn, disc_fn, gcfg)
    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(cfg.seed)):
            disc_fn(gen_fn(2))
    gp, dp, rest = split_params(ctx.params, "Generator", "Discriminator")
    assert not rest
    state = init_state(gp, dp)

    run_step = step_fn
    data_state = set_data_state = None
    if not cfg.DATA_DIR and cfg.input == "hbm":
        # HBM-resident synthetic pool; selection/flip/dequant inside the
        # jitted step — zero host->device feed per iteration (measured
        # rationale in data/hbm_input.py)
        from ..data.hbm_input import make_hbm_input
        from ..data.synthetic import synthetic_images

        flat_pool, _ = synthetic_images(2048, 3, 128, seed=cfg.seed)
        run_step, next_batch, data_state, set_data_state = make_hbm_input(
            step_fn, flat_pool, batch_size=cfg.BATCH_SIZE,
            critic_iters=cfg.CRITIC_ITERS, chw=(3, 128, 128), seed=cfg.seed,
        )
    else:
        gen = images_dir.prefetch(
            stack_batches(
                images_dir.image_dir_generator(cfg.DATA_DIR or None, cfg.BATCH_SIZE, 128, seed=cfg.seed),
                cfg.CRITIC_ITERS,
            )
        )

        def next_batch():
            raw = next(gen)
            flat = raw.reshape(cfg.CRITIC_ITERS, cfg.BATCH_SIZE, OUTPUT_DIM)
            return (jnp.asarray(2.0 * (flat.astype("float32") / 255.0 - 0.5)),)

    fixed_noise = jnp.asarray(
        np.random.default_rng(cfg.seed).normal(size=(64, 128)).astype("f4")
    )
    logger = MetricLogger(out_dir, print_std=True)  # LSUN fork plot style
    jit_sample = jax.jit(sample_fn)

    def test_fn(state, iteration):
        samples = jit_sample(state, fixed_noise, jax.random.PRNGKey(0))
        save_sample_grid(samples, (3, 128, 128), f"{out_dir}/samples_{iteration}.png")
        return {}

    lcfg = LoopConfig(
        iters=cfg.ITERS, print_every=100, test_every=cfg.sample_every,
        save_every=cfg.save_every, ckpt_dir=f"{out_dir}/ckpt",
        allow_fresh_start=cfg.allow_fresh_start,
    )
    kw = {}
    if data_state is not None:
        kw = {"data_state": data_state, "set_data_state": set_data_state}
    return train_loop(
        state, run_step, next_batch, jax.random.PRNGKey(cfg.seed), lcfg,
        logger=logger, test_fn=test_fn, **kw,
    )


if __name__ == "__main__":
    main()
