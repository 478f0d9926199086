"""CT-GAN trainer: one fused pjit step for the full 5:1 critic cycle.

Rebuild of the reference's session loops (CT_gan_cifar.py:186-236,
CT_gan_cifar_resnet.py:393-434), redesigned for TPU:

* The whole iteration — one generator update followed by ``critic_iters``
  discriminator updates over a stacked ``[K, B, D]`` batch — is **one traced
  XLA program** (``lax.scan`` over critic sub-batches).  The reference paid a
  ``sess.run`` + ``feed_dict`` host round-trip per sub-step; here the host
  only feeds one stacked batch per generator iteration.
* All four shared-weight discriminator passes (clean, two CT-perturbed, GP
  interpolates with its double backward) live in the same program and fuse;
  no A/B device split (SURVEY §2e).
* Under a mesh, the batch axis is sharded over ``data``; XLA inserts the
  gradient all-reduces.  ``donate`` on the state keeps params in place.

Modes: ``wgan-CT`` (CT+GP, Adam), ``wgan-gp`` (GP only), ``wgan``
(weight clipping + RMSProp), ``dcgan`` (sigmoid CE), ``lsgan``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import apply_context, rng_context
from ..core import rng as rng_mod
from ..losses.gan import (
    consistency_term,
    dcgan_losses,
    gradient_penalty,
    lsgan_losses,
    wgan_losses,
)
from . import optim, schedules

__all__ = ["GanConfig", "GANState", "make_gan_trainer"]


@dataclass(frozen=True)
class GanConfig:
    mode: str = "wgan-CT"
    batch_size: int = 64
    critic_iters: int = 5
    lambda_gp: float = 10.0        # LAMBDA (CT_gan_cifar.py:39)
    lambda_ct: float = 2.0         # LAMBDA_2 (CT_gan_cifar.py:35)
    factor_m: float = 0.0          # Factor_M (CT_gan_cifar.py:36)
    lr: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.9
    iters: int = 50000
    lr_decay: bool = False         # linear decay (resnet trainer)
    clip_value: float = 0.01       # wgan weight clip (CT_gan_mnist.py:141)
    gen_bs_multiple: int = 1       # GEN_BS_MULTIPLE (resnet trainer)
    remat: bool = False            # jax.checkpoint the D forward (HBM vs FLOPs
                                   # for 128px models; replaces the reference's
                                   # A/B-split memory workaround)
    clip_global_norm: float | None = None  # train_loop_2-style grad clip 5.0
    clip_grad_value: float | None = None   # train_loop v1 per-element clip
    opt_state_dtype: str = "float32"       # "bfloat16": moment buffers in
                                           # bf16 (optim.with_state_dtype)


class GANState(NamedTuple):
    gen_params: dict
    disc_params: dict
    gen_opt: dict
    disc_opt: dict
    step: jax.Array


def _make_optimizers(cfg: GanConfig):
    if cfg.mode in ("wgan-CT", "wgan-ct", "wgan-gp"):
        lr = schedules.linear_decay(cfg.lr, cfg.iters) if cfg.lr_decay else cfg.lr
        mk = lambda: optim.adam(lr, cfg.beta1, cfg.beta2)
        pair = mk(), mk()
    elif cfg.mode == "wgan":
        pair = optim.rmsprop(5e-5), optim.rmsprop(5e-5)
    elif cfg.mode == "dcgan":
        pair = optim.adam(2e-4, 0.5), optim.adam(2e-4, 0.5)
    elif cfg.mode == "lsgan":
        pair = optim.rmsprop(1e-4), optim.rmsprop(1e-4)
    else:
        raise ValueError(f"unknown mode {cfg.mode!r}")
    if cfg.opt_state_dtype != "float32":
        import jax.numpy as jnp

        sd = jnp.dtype(cfg.opt_state_dtype)
        pair = tuple(optim.with_state_dtype(o, sd) for o in pair)
    return pair


def make_gan_trainer(
    gen_fn: Callable[..., jax.Array],
    disc_fn: Callable[..., tuple[jax.Array, jax.Array]],
    cfg: GanConfig,
    spmd_hooks=None,
):
    """Build (init_state, step_fn, eval_fns) for an unconditional CT-GAN.

    ``gen_fn(n_samples)`` must produce flat fake images using the 'noise' RNG
    stream; ``disc_fn(x)`` must return ``(logits, features)`` drawing dropout
    from the 'dropout' stream.  Both read params from the ambient context.

    ``spmd_hooks`` (parallel.spmd.SpmdHooks) switches the substeps to
    manual-SPMD semantics for use INSIDE ``jax.shard_map``: params are
    gathered before each loss, gradients cross-mesh-averaged (and re-sliced
    for model-sharded leaves) before the optimizer update, metrics averaged
    over the mesh.  With hooks set, ``state`` holds model-axis SHARDS and
    ``cfg.batch_size`` must already be the per-device micro-batch; the
    step/eval fns only make sense inside the owning shard_map (see
    parallel/spmd.py, which is the only intended caller).
    """
    gen_optimizer, disc_optimizer = _make_optimizers(cfg)
    is_ct = cfg.mode in ("wgan-CT", "wgan-ct")
    is_gp = is_ct or cfg.mode == "wgan-gp"
    if cfg.remat:
        from .remat import make_remat_disc

        disc_fn = make_remat_disc(disc_fn)

    # ---------------------------------------------------------- losses

    def disc_loss(disc_params, gen_params, real, key):
        with rng_context({"default": key}):
            with apply_context({**gen_params, **disc_params}):
                fake = gen_fn(real.shape[0])
                d_real, f_real = disc_fn(real)
                metrics = {}
                if cfg.mode in ("dcgan", "lsgan"):
                    d_fake, _ = disc_fn(fake)
                    loss_fn = dcgan_losses if cfg.mode == "dcgan" else lsgan_losses
                    _, cost = loss_fn(d_real, d_fake)
                    metrics["disc_cost"] = cost
                    return cost, metrics
                # wgan family
                d_fake, _ = disc_fn(fake)
                _, cost = wgan_losses(d_real, d_fake)
                metrics["wgan"] = cost
                if is_ct:
                    d_real_2, f_real_2 = disc_fn(real)
                    ct = consistency_term(
                        d_real, d_real_2, f_real, f_real_2,
                        lambda_2=cfg.lambda_ct, factor_m=cfg.factor_m,
                    )
                    cost = cost + ct
                    metrics["ct"] = ct
                if is_gp:
                    gp, slopes = gradient_penalty(
                        disc_fn, real, fake, rng_mod.next_key("gp")
                    )
                    cost = cost + cfg.lambda_gp * gp
                    metrics["gp"] = gp
                metrics["disc_cost"] = cost
                return cost, metrics

    def gen_loss(gen_params, disc_params, key):
        with rng_context({"default": key}):
            with apply_context({**gen_params, **disc_params}):
                n = cfg.batch_size * cfg.gen_bs_multiple
                fake = gen_fn(n)
                d_fake, _ = disc_fn(fake)
                if cfg.mode == "dcgan":
                    cost, _ = dcgan_losses(jnp.zeros(1), d_fake)
                elif cfg.mode == "lsgan":
                    cost, _ = lsgan_losses(jnp.zeros(1), d_fake)
                else:
                    cost = -jnp.mean(d_fake)
                return cost

    disc_grad = jax.value_and_grad(disc_loss, has_aux=True)
    gen_grad = jax.value_and_grad(gen_loss)

    # ------------------------------------------------------------ step

    # Decomposed into substeps so the iteration can run fused (one XLA
    # program; static python critic loop — +8.8% on v5e vs lax.scan) or
    # unfused (one jit per substep — required under model-axis sharding,
    # where XLA's SPMD partitioner miscompiles chained grad+update
    # iterations in one program: docs/XLA_GSPMD_SCAN_BUG.md).  Key
    # derivations depend only on (base_key, state.step, i), so both
    # execution modes are numerically identical.

    def gen_substep(state: GANState, base_key):
        """G update (skipped at step 0, 'if iteration > 0'
        CT_gan_cifar.py:192).  Does NOT bump state.step."""
        key = jax.random.fold_in(base_key, state.step)
        if spmd_hooks is None:
            gp_full, dp_full = state.gen_params, state.disc_params
        else:
            gp_full = spmd_hooks.gather_gen(state.gen_params)
            dp_full = spmd_hooks.gather_disc(state.disc_params)
        (g_cost, g_grads) = gen_grad(
            gp_full, dp_full, jax.random.fold_in(key, 1000)
        )
        if spmd_hooks is not None:
            g_grads = spmd_hooks.sync_gen_grads(g_grads)
            g_cost = spmd_hooks.sync_metrics(g_cost)
        new_gen_params, new_gen_opt = gen_optimizer.update(
            g_grads, state.gen_opt, state.gen_params, state.step
        )
        do_gen = (state.step > 0).astype(jnp.float32)
        # blend in fp32 but keep each leaf's storage dtype (bf16 opt-state
        # leaves must round-trip unchanged or the scan carry dtypes diverge;
        # do_gen is exactly 0 or 1 so the cast back is lossless)
        blend = lambda new, old: (
            do_gen * new + (1.0 - do_gen) * old
        ).astype(old.dtype)
        gen_params = jax.tree.map(blend, new_gen_params, state.gen_params)
        gen_opt = jax.tree.map(blend, new_gen_opt, state.gen_opt)
        return (
            GANState(gen_params, state.disc_params, gen_opt, state.disc_opt, state.step),
            g_cost,
        )

    def critic_substep(state: GANState, i, real, base_key):
        """One critic iteration.  Does NOT bump state.step."""
        key = jax.random.fold_in(base_key, state.step)
        if spmd_hooks is None:
            dp_full, gp_full = state.disc_params, state.gen_params
        else:
            dp_full = spmd_hooks.gather_disc(state.disc_params)
            gp_full = spmd_hooks.gather_gen(state.gen_params)
        (cost, metrics), grads = disc_grad(
            dp_full, gp_full, real, jax.random.fold_in(key, i)
        )
        if spmd_hooks is not None:
            # mesh-mean (and re-slice) BEFORE clipping, so clips see the
            # same grad values the single-device program would
            grads = spmd_hooks.sync_disc_grads(grads)
            metrics = spmd_hooks.sync_metrics(metrics)
        if cfg.clip_grad_value is not None:
            grads = optim.clip_grads_by_value(grads, cfg.clip_grad_value)
        if cfg.clip_global_norm is not None:
            grads, gradnorm = optim.clip_grads_by_global_norm(
                grads, cfg.clip_global_norm
            )
            metrics["gradnorm"] = gradnorm
        disc_params, disc_opt = disc_optimizer.update(
            grads, state.disc_opt, state.disc_params, state.step
        )
        if cfg.mode == "wgan":
            disc_params = optim.clip_params_by_value(disc_params, cfg.clip_value)
        return (
            GANState(state.gen_params, disc_params, state.gen_opt, disc_opt, state.step),
            metrics,
        )

    def bump_step(state: GANState) -> GANState:
        return GANState(
            state.gen_params, state.disc_params, state.gen_opt, state.disc_opt,
            state.step + 1,
        )

    def step_fn(state: GANState, real_stack: jax.Array, base_key: jax.Array):
        """One generator iteration: G update + critic_iters D updates.

        ``real_stack``: [critic_iters, batch, features] real batches.
        """
        state, g_cost = gen_substep(state, base_key)
        for i in range(real_stack.shape[0]):
            state, metrics = critic_substep(state, i, real_stack[i], base_key)
        metrics["gen_cost"] = g_cost
        return bump_step(state), metrics

    step_fn.gen_substep = gen_substep
    step_fn.critic_substep = critic_substep
    step_fn.bump_step = bump_step
    # loss/optimizer pieces for external composition (parallel/spmd.py's
    # emulation tests, tooling)
    step_fn.pieces = {
        "gen_grad": gen_grad, "disc_grad": disc_grad,
        "gen_optimizer": gen_optimizer, "disc_optimizer": disc_optimizer,
    }

    # ------------------------------------------------------- eval utils

    def disc_cost_fn(state: GANState, real: jax.Array, key: jax.Array):
        """Dev-set discriminator cost (the 'dev disc cost' metric,
        CT_gan_cifar.py:215-230)."""
        cost, _metrics = disc_loss(state.disc_params, state.gen_params, real, key)
        return cost

    def sample_fn(state: GANState, noise: jax.Array, key: jax.Array):
        """Fixed-noise sample grid (CT_gan_cifar.py:160-165)."""
        with rng_context({"default": key}):
            with apply_context(state.gen_params):
                return gen_fn(noise.shape[0], noise=noise)

    def init_state(gen_params: dict, disc_params: dict) -> GANState:
        return GANState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=gen_optimizer.init(gen_params),
            disc_opt=disc_optimizer.init(disc_params),
            step=jnp.zeros((), jnp.int32),
        )

    return init_state, step_fn, sample_fn, disc_cost_fn
