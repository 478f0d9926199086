"""Conditional ResNet/ACGAN CT-GAN on CIFAR-10 — the flagship trainer
(rebuild of CT_gan_cifar_resnet.py).

Full 50k training set, linear LR decay, GEN_BS_MULTIPLE=2, IS(50k) every
1000 iterations.  The reference's 2-GPU A/B graph split becomes one fused
pjit step, data-parallel over all available devices.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import init_context, rng_context, split_params
from ..data import DeviceSampler, cifar10
from ..models import resnet_cifar
from ..parallel import shard_params
from ..train import AcganConfig, LoopConfig, make_acgan_trainer, train_loop
from ..core.store import format_param_table
from ..utils import MetricLogger
from .common import maybe_mesh, parse_config, pick_scorer, save_sample_grid, setup_out_dir


@dataclass(frozen=True)
class Config:
    LAMBDA_2: float = 2.0
    Factor_M: float = 0.0
    BATCH_SIZE: int = 64
    GEN_BS_MULTIPLE: int = 2
    ITERS: int = 100000
    DIM_G: int = 128
    DIM_D: int = 128
    NORMALIZATION_G: bool = True
    NORMALIZATION_D: bool = False
    LR: float = 2e-4
    DECAY: bool = True
    N_CRITIC: int = 5
    INCEPTION_FREQUENCY: int = 1000
    CONDITIONAL: bool = True
    ACGAN: bool = True
    ACGAN_SCALE: float = 1.0
    ACGAN_SCALE_G: float = 0.1
    n_examples: int = 50000
    DATA_DIR: str = ""
    BF16: bool = True            # bf16 conv/matmul compute on TPU
    PALLAS_DROPOUT: bool = True  # on-core PRNG dropout kernel on TPU
    CLEAN_PASS: bool = True      # False drops the kp=1 monitoring D pass
                                 # (acc_real/acc_fake) from the hot loop — a
                                 # measured −1.2% step-time cut with
                                 # bit-identical losses (VALIDATION r3)
    REMAT: bool = False          # recompute the D forward in the GP double
                                 # backward (fits-in-HBM escape hatch; loses
                                 # ~40% when activations already fit)
    OPT_STATE_DTYPE: str = "float32"  # "bfloat16" halves Adam-state traffic
                                 # (optim.with_state_dtype); experimental
    FUSE_CT_PASSES: bool = True  # one 2x-batch D pass for the CT pair vs
                                 # two single-batch passes (identical
                                 # numerics; layout A/B lever — bench_all
                                 # resnet_ab measures both)
    FUSE_MEANPOOL: bool = True   # fold conv+mean_pool into ONE stride-2
                                 # conv (identical params/math; removes the
                                 # full-res pre-pool activation + its VJP
                                 # broadcast from HBM).  Chip A/B: 24.5 ->
                                 # 14.8 ms/iter (runs/queue_r4e.log); env
                                 # opt-out CTGAN_FUSE_MEANPOOL=0 wins over
                                 # this flag
    MODEL_AXIS: int = 1          # tensor-parallel mesh axis; >1 switches to
                                 # the TP-safe unfused step (see
                                 # docs/XLA_GSPMD_SCAN_BUG.md)
    seed: int = 0
    allow_fresh_start: bool = False  # train from scratch in an out_dir whose
                                     # log.pkl shows progress (utils/resume.py)
    out_dir: str = "runs/ct_gan_cifar_resnet"
    inception_samples: int = 50000
    sample_every: int = 100
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

    mcfg = resnet_cifar.ResnetCifarConfig(
        dim_g=cfg.DIM_G, dim_d=cfg.DIM_D,
        conditional=cfg.CONDITIONAL, acgan=cfg.ACGAN,
        normalization_g=cfg.NORMALIZATION_G, normalization_d=cfg.NORMALIZATION_D,
    )
    if cfg.CONDITIONAL and not cfg.ACGAN and not cfg.NORMALIZATION_D:
        print("WARNING! Conditional model without normalization in D might be "
              "effectively unconditional!")  # reference :60

    def gen_fn(n, labels, noise=None):
        return resnet_cifar.generator(n, labels, noise=noise, cfg=mcfg)

    def disc_fn(x, labels, kp1, kp2, kp3):
        return resnet_cifar.discriminator(x, labels, kp1, kp2, kp3, mcfg)

    tcfg = AcganConfig(
        batch_size=cfg.BATCH_SIZE, critic_iters=cfg.N_CRITIC,
        lambda_ct=cfg.LAMBDA_2, factor_m=cfg.Factor_M,
        lr=cfg.LR, iters=cfg.ITERS, decay=cfg.DECAY,
        gen_bs_multiple=cfg.GEN_BS_MULTIPLE,
        conditional=cfg.CONDITIONAL, acgan=cfg.ACGAN,
        acgan_scale=cfg.ACGAN_SCALE, acgan_scale_g=cfg.ACGAN_SCALE_G,
        clean_pass=cfg.CLEAN_PASS, remat=cfg.REMAT,
        opt_state_dtype=cfg.OPT_STATE_DTYPE,
        fuse_ct_passes=cfg.FUSE_CT_PASSES,
    )
    init_state, step_fn, sample_fn, generate_fn, dev_cost_fn = make_acgan_trainer(gen_fn, disc_fn, tcfg)

    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(cfg.seed)):
            labels = jnp.zeros((2,), jnp.int32)
            disc_fn(gen_fn(2, labels), labels, 0.8, 0.5, 0.5)
    gparams, dparams, rest = split_params(ctx.params, "Generator", "Discriminator")
    assert not rest
    print(format_param_table(gparams, "G Params"))
    print(format_param_table(dparams, "D Params"))

    mesh = maybe_mesh(model_axis=cfg.MODEL_AXIS)
    tp = mesh is not None and cfg.MODEL_AXIS > 1
    if mesh is not None:
        gparams = shard_params(mesh, gparams)
        dparams = shard_params(mesh, dparams)
    state = init_state(gparams, dparams)

    data = cifar10.load_arrays(cfg.DATA_DIR or None, n_examples=cfg.n_examples)
    sampler = DeviceSampler(
        [data["train"][0].astype("uint8"), data["train"][1].astype("int32")],
        cfg.BATCH_SIZE, cfg.N_CRITIC, seed=cfg.seed,
    )
    dev_images, dev_labels = data["test"]

    scorer = pick_scorer(3, 32, out_dir, train_data=data["train"])

    fixed_noise = jnp.asarray(
        np.random.default_rng(cfg.seed).normal(size=(100, 128)).astype("f4")
    )
    fixed_labels = jnp.asarray(np.array([0,1,2,3,4,5,6,7,8,9] * 10), jnp.int32)
    logger = MetricLogger(out_dir)
    jit_sample = jax.jit(sample_fn)
    jit_dev_cost = jax.jit(dev_cost_fn)

    if tp:
        # TP-safe unfused execution: one grad+update per XLA program
        # (docs/XLA_GSPMD_SCAN_BUG.md); train_loop must not re-jit it.
        from ..train import make_unfused_step

        unfused = make_unfused_step(step_fn, has_labels=True)

        def fused_step(state, step_idx, data, perm, key):
            real_stack, label_stack = sampler.sample(step_idx, data, perm)
            return unfused(state, real_stack, label_stack, key)
    else:
        # dataset arrays + epoch shuffle go through the jit boundary as
        # arguments (see DeviceSampler.sample) — closure constants this
        # large overflow remote-compile transports, and the in-trace
        # permutation costs a 50k-element device sort per step
        def fused_step(state, step_idx, data, perm, key):
            real_stack, label_stack = sampler.sample(step_idx, data, perm)
            return step_fn(state, real_stack, label_stack, key)

    counter = {"i": 0}
    data_args = tuple(sampler.arrays)

    def next_batch():
        i = counter["i"]
        counter["i"] += 1
        return (jnp.asarray(i), data_args, sampler.host_perm(i))

    # All dev batches in ONE jitted call: over a tunneled TPU every
    # dispatch+readback costs a round trip; 10 sequential dev-cost calls
    # per test were pure latency.  (Not vmapped — the pallas dropout kernel
    # takes a scalar seed; a 10x-sized single batch is equivalent for the
    # mean cost.)
    dev_all_x = jnp.asarray(dev_images[: cfg.BATCH_SIZE * 10], jnp.int32)
    dev_all_y = jnp.asarray(dev_labels[: cfg.BATCH_SIZE * 10], jnp.int32)

    gen_chunk = 5000  # 10 big device calls per IS eval instead of 500 small

    @partial(jax.jit, static_argnums=1)
    def jit_generate_u8(state, n, key):
        # uint8 on device: fetching 50k float32 samples over the TPU tunnel
        # costs 4x the bytes for no benefit (the scorer quantizes anyway)
        flat, _ = generate_fn(state, n, key)
        return ((flat + 1.0) * (255.99 / 2)).astype(jnp.uint8)

    def test_fn(state, iteration):
        metrics = {}
        metrics["dev_cost"] = float(
            jit_dev_cost(state, dev_all_x, dev_all_y, jax.random.PRNGKey(1))
        )
        samples = jit_sample(state, fixed_noise, fixed_labels, jax.random.PRNGKey(0))
        save_sample_grid(samples, (3, 32, 32), f"{out_dir}/samples_{iteration}.png")
        if cfg.INCEPTION_FREQUENCY and iteration % cfg.INCEPTION_FREQUENCY == cfg.INCEPTION_FREQUENCY - 1:
            outs = []
            for i in range(0, cfg.inception_samples, gen_chunk):
                outs.append(np.asarray(
                    jit_generate_u8(state, gen_chunk, jax.random.PRNGKey(i))
                ))
            all_samples = np.concatenate(outs)[: cfg.inception_samples].astype("int32")
            m, s = scorer.inception_score(all_samples)
            metrics["inception_50k"] = m
            metrics["inception_50k_std"] = s
            real_sub = dev_images[: min(len(dev_images), 10000)]
            metrics["fid_10k"] = scorer.fid(real_sub, all_samples[: len(real_sub)])
        return metrics

    lcfg = LoopConfig(
        iters=cfg.ITERS, print_every=100, test_every=cfg.sample_every,
        save_every=cfg.save_every, ckpt_dir=f"{out_dir}/ckpt",
        allow_fresh_start=cfg.allow_fresh_start,
        keep_checkpoints=5, jit_step=not tp,
    )
    ctx_mgr = mesh if mesh is not None else _nullcontext()
    with ctx_mgr:
        state = train_loop(
            state, fused_step, next_batch, jax.random.PRNGKey(cfg.seed), lcfg,
            logger=logger, test_fn=test_fn,
            data_state=lambda: {"i": counter["i"]},
            set_data_state=lambda s: counter.update(i=int(s["i"])),
        )
    return state


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
