"""64x64 CT-GAN (rebuild of CT_gan_64x64.py).

The architecture zoo is selectable by flag instead of the reference's
comment-uncommenting menu (:41-72): ``--ARCH good|dcgan|fc|crippled|
multiplicative|resnet101``.  Modes: wgan-ct / wgan-gp / wgan / dcgan / lsgan.
Data: 64px image directory (small ImageNet layout) or synthetic fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import init_context, rng_context, split_params
from ..data import images_dir, stack_batches
from ..models import dcgan, fc, good64
from ..train import GanConfig, LoopConfig, make_gan_trainer, train_loop
from ..utils import MetricLogger
from .common import parse_config, pick_scorer, save_sample_grid, setup_out_dir

OUTPUT_DIM = 64 * 64 * 3


@dataclass(frozen=True)
class Config:
    MODE: str = "wgan-ct"
    ARCH: str = "good"
    REMAT: bool = False              # recompute D forward (HBM escape hatch)
    OPT_STATE_DTYPE: str = "float32"  # "bfloat16": Adam moments in bf16
    BF16: bool = True            # bf16 conv/matmul compute on TPU (the step
                                 # is HBM-byte-bound: 178 GB/iter modeled —
                                 # fp32 activations double that traffic)
    PALLAS_DROPOUT: bool = True  # on-core PRNG dropout kernel on TPU
    FUSE_MEANPOOL: bool = True   # fold conv+mean_pool into ONE stride-2
                                 # conv (exact rewrite).  Chip A/B: 0.2075
                                 # -> 0.1562 s/iter, -24.7%
                                 # (runs/queue_r5a.log mpf_ab); env opt-out
                                 # CTGAN_FUSE_MEANPOOL=0 wins over this flag
    DIM: int = 64
    BATCH_SIZE: int = 64
    CRITIC_ITERS: int = 5
    LAMBDA: float = 10.0
    LAMBDA_2: float = 2.0
    Factor_M: float = 0.0
    ITERS: int = 200000
    DATA_DIR: str = ""
    seed: int = 0
    allow_fresh_start: bool = False  # train from scratch in an out_dir whose
                                     # log.pkl shows progress (utils/resume.py)
    out_dir: str = "runs/ct_gan_64x64"
    sample_every: int = 200
    save_every: int = 1000
    inception_every: int = 2000  # IS cadence (CT_gan_64x64.py:583-594)
    inception_samples: int = 1000
    input: str = "hbm"           # hbm: DeviceSampler pool resident in HBM,
                                 # flip+dequant fused into the jitted step
                                 # (zero host->device feed per iteration —
                                 # the tunneled host feed costs ~3x step
                                 # time, runs/final_pass_r2.log io64 rows);
                                 # native: C++ host pipeline; dir: image dir


def pick_arch(cfg: Config):
    """The GeneratorAndDiscriminator() menu (CT_gan_64x64.py:41-72)."""
    if cfg.ARCH == "good":
        return (
            partial(good64.good64_generator, dim=cfg.DIM),
            lambda x: good64.good64_discriminator(x, cfg.DIM, mode=cfg.MODE),
        )
    if cfg.ARCH == "dcgan":
        return (
            partial(dcgan.dcgan64_generator, dim=cfg.DIM),
            partial(dcgan.dcgan64_discriminator, dim=cfg.DIM, mode=cfg.MODE),
        )
    if cfg.ARCH == "crippled":
        return (
            partial(dcgan.crippled_dcgan64_generator, dim=cfg.DIM),
            partial(dcgan.dcgan64_discriminator, dim=cfg.DIM, mode=cfg.MODE),
        )
    if cfg.ARCH == "fc":
        return (
            partial(fc.fc_generator, output_dim=OUTPUT_DIM),
            partial(dcgan.dcgan64_discriminator, dim=cfg.DIM, mode=cfg.MODE),
        )
    if cfg.ARCH == "multiplicative":
        return (
            partial(dcgan.multiplicative_dcgan64_generator, dim=cfg.DIM),
            partial(dcgan.multiplicative_dcgan64_discriminator, dim=cfg.DIM, mode=cfg.MODE),
        )
    if cfg.ARCH == "resnet101":
        return (
            partial(good64.resnet101_64_generator, dim=cfg.DIM),
            partial(good64.resnet101_64_discriminator, dim=cfg.DIM),
        )
    raise ValueError(f"unknown ARCH {cfg.ARCH!r}")


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

    gen_fn, disc_fn = pick_arch(cfg)

    gcfg = GanConfig(
        mode=cfg.MODE, batch_size=cfg.BATCH_SIZE, critic_iters=cfg.CRITIC_ITERS,
        lambda_gp=cfg.LAMBDA, lambda_ct=cfg.LAMBDA_2, factor_m=cfg.Factor_M,
        iters=cfg.ITERS, remat=cfg.REMAT, opt_state_dtype=cfg.OPT_STATE_DTYPE,
    )
    init_state, step_fn, sample_fn, _ = make_gan_trainer(gen_fn, disc_fn, gcfg)
    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(cfg.seed)):
            disc_fn(gen_fn(2))
    gp, dp, rest = split_params(ctx.params, "Generator", "Discriminator")
    assert not rest
    state = init_state(gp, dp)

    critic_iters = 1 if cfg.MODE == "dcgan" else cfg.CRITIC_ITERS
    from ..data.native import NativePipeline, native_available
    from ..data.synthetic import synthetic_images

    scorer_train = None  # (flat uint8 images, labels) for the IS scorer fit
    run_step = step_fn
    data_state = set_data_state = None
    if not cfg.DATA_DIR and cfg.input == "hbm":
        # HBM-resident pool + in-step selection/flip/dequant (fully
        # host-free input; measured rationale in data/hbm_input.py)
        from ..data.hbm_input import make_hbm_input

        flat, labels = synthetic_images(4096, 3, 64, seed=cfg.seed)
        scorer_train = (flat, labels)
        run_step, next_batch, data_state, set_data_state = make_hbm_input(
            step_fn, flat, batch_size=cfg.BATCH_SIZE,
            critic_iters=critic_iters, chw=(3, 64, 64), seed=cfg.seed,
        )

    elif not cfg.DATA_DIR and cfg.input == "native" and native_available():
        # native C++ batcher: threaded shuffle + flip + normalize over the
        # in-memory dataset (file-dir path below decodes in Python)
        flat, labels = synthetic_images(4096, 3, 64, seed=cfg.seed)
        scorer_train = (flat, labels)
        pipe = NativePipeline(
            flat, None, cfg.BATCH_SIZE, critic_iters, chw=(3, 64, 64),
            flip=True, seed=cfg.seed,
        )

        def next_batch():
            imgs, _ = pipe.next()
            return (jnp.asarray(imgs),)

    else:
        gen = images_dir.prefetch(
            stack_batches(
                images_dir.image_dir_generator(cfg.DATA_DIR or None, cfg.BATCH_SIZE, 64, seed=cfg.seed),
                critic_iters,
            )
        )

        def next_batch():
            raw = next(gen)  # [K, B, 3, 64, 64] uint8
            flat = raw.reshape(critic_iters, cfg.BATCH_SIZE, OUTPUT_DIM)
            real = 2.0 * (flat.astype("float32") / 255.0 - 0.5)
            return (jnp.asarray(real),)

    fixed_noise = jnp.asarray(
        np.random.default_rng(cfg.seed).normal(size=(64, 128)).astype("f4")
    )
    logger = MetricLogger(out_dir)
    jit_sample = jax.jit(sample_fn)

    # IS/FID cadence, like the reference's 64x64 inception hook
    # (CT_gan_64x64.py:583-594): Inception-2015 when weights are supplied,
    # else the self-contained TrainedScorer fit on the labeled training set.
    scorer = None
    if cfg.inception_every:
        scorer = pick_scorer(3, 64, out_dir, train_data=scorer_train)
        if not getattr(scorer, "comparable", False) and getattr(scorer, "params", 1) is None:
            print("IS cadence disabled: no inception file and no labeled data")
            scorer = None

    def generate_samples(state, n):
        outs = []
        for i in range(0, n, 100):
            noise = jax.random.normal(jax.random.PRNGKey(2000 + i), (100, 128))
            outs.append(np.asarray(jit_sample(state, noise, jax.random.PRNGKey(i))))
        flat = np.concatenate(outs)[:n]
        return ((flat + 1.0) * (255.0 / 2)).astype("int32")

    def test_fn(state, iteration):
        metrics = {}
        samples = jit_sample(state, fixed_noise, jax.random.PRNGKey(0))
        save_sample_grid(samples, (3, 64, 64), f"{out_dir}/samples_{iteration}.png")
        if scorer is not None and iteration % cfg.inception_every == cfg.inception_every - 1:
            fakes = generate_samples(state, cfg.inception_samples)
            is_mean, is_std = scorer.inception_score(fakes)
            metrics["inception score"] = is_mean
            if scorer_train is not None:
                metrics["fid"] = float(
                    scorer.fid(scorer_train[0][: cfg.inception_samples], fakes)
                )
        return metrics

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
