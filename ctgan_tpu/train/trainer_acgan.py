"""Conditional ACGAN CT-GAN trainer (rebuild of CT_gan_cifar_resnet.py's
graph build + loop, lines 188-434).

Differences from the unconditional trainer worth naming:

* The critic batch is processed **real‖fake concatenated** through one D
  pass (reference line 214-221), twice for the CT pair, plus a clean
  (kp=1) pass for the accuracy monitors — all in one program.
* ACGAN CE on the real half joins the critic loss at ``acgan_scale``; the
  generator gets its own CE at ``acgan_scale_g``.
* Linear LR decay from ``_iteration`` (reference :309-312) via the schedule.
* ``gen_bs_multiple`` — generator batches are 2x the critic batch.
* Real inputs are dequantized with U[0, 1/128) noise (reference :202) inside
  the step.

The reference's DEVICES_A/DEVICES_B graph split is replaced by batch sharding
over the mesh 'data' axis (see parallel.mesh docstring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import apply_context, rng_context
from ..core import rng as rng_mod
from ..losses.gan import (
    acgan_accuracy,
    acgan_loss,
    consistency_term,
    gradient_penalty,
    wgan_losses,
)
from . import optim, schedules

__all__ = ["AcganConfig", "AcganState", "make_acgan_trainer"]


@dataclass(frozen=True)
class AcganConfig:
    batch_size: int = 64
    critic_iters: int = 5           # N_CRITIC (:51)
    lambda_gp: float = 10.0
    lambda_ct: float = 2.0          # LAMBDA_2 (:37)
    factor_m: float = 0.0
    lr: float = 2e-4                # LR (:48)
    beta1: float = 0.0              # (:333-334)
    beta2: float = 0.9
    iters: int = 100000             # ITERS (:41)
    decay: bool = True              # DECAY (:49)
    gen_bs_multiple: int = 2        # GEN_BS_MULTIPLE (:40)
    n_labels: int = 10
    conditional: bool = True
    acgan: bool = True
    acgan_scale: float = 1.0        # ACGAN_SCALE (:57)
    acgan_scale_g: float = 0.1      # ACGAN_SCALE_G (:58)
    kp: tuple = (0.8, 0.5, 0.5)     # dropout keep probs (:232)
    remat: bool = False             # jax.checkpoint the D forward
    fuse_ct_passes: bool = True     # run the two CT passes as ONE 2x-batch D
                                    # pass (independent per-example dropout ==
                                    # two independent passes; valid because
                                    # this D has no batch-coupled norm)
    opt_state_dtype: str = "float32"  # "bfloat16" stores Adam m/v in bf16
                                    # (optim.with_state_dtype): an HBM-traffic
                                    # cut on a byte-bound step; params stay
                                    # fp32.  Default-off pending an
                                    # at-schedule equivalence run.
    clean_pass: bool = True         # run the kp=1 monitoring D pass every
                                    # critic substep (reference :232-266 uses
                                    # it only for acc_real/acc_fake).  False
                                    # drops that forward from the hot loop
                                    # (the accuracies remain available through
                                    # the eval path) — a pure HBM-traffic cut
                                    # on an HBM-bound step.


class AcganState(NamedTuple):
    gen_params: dict
    disc_params: dict
    gen_opt: dict
    disc_opt: dict
    step: jax.Array


def make_acgan_trainer(
    gen_fn: Callable,   # gen_fn(n, labels, noise=None) -> flat images
    disc_fn: Callable,  # disc_fn(x, labels, kp1, kp2, kp3) -> DiscOut
    cfg: AcganConfig,
    spmd_hooks=None,
):
    # spmd_hooks: manual-SPMD collective hooks for use inside shard_map —
    # see trainer_gan.make_gan_trainer and parallel/spmd.py (only caller).
    lr = schedules.linear_decay(cfg.lr, cfg.iters) if cfg.decay else cfg.lr
    gen_optimizer = optim.adam(lr, cfg.beta1, cfg.beta2)
    disc_optimizer = optim.adam(lr, cfg.beta1, cfg.beta2)
    if cfg.opt_state_dtype != "float32":
        _sd = jnp.dtype(cfg.opt_state_dtype)
        gen_optimizer = optim.with_state_dtype(gen_optimizer, _sd)
        disc_optimizer = optim.with_state_dtype(disc_optimizer, _sd)
    kp1, kp2, kp3 = cfg.kp
    if cfg.remat:
        from .remat import make_remat_disc

        disc_fn = make_remat_disc(disc_fn, n_static_tail=3)

    def _rand_labels(key, n):
        # tf.cast(tf.random_uniform([n])*10, tf.int32) (:317)
        return jax.random.randint(key, (n,), 0, cfg.n_labels)

    def disc_loss(disc_params, gen_params, real, labels, key):
        b = real.shape[0]
        with rng_context({"default": key}):
            with apply_context({**gen_params, **disc_params}):
                fake = gen_fn(b, labels)
                both = jnp.concatenate([real, fake], axis=0)
                both_labels = jnp.concatenate([labels, labels], axis=0)

                if cfg.fuse_ct_passes:
                    doubled = jnp.concatenate([both, both], axis=0)
                    doubled_labels = jnp.concatenate([both_labels, both_labels], axis=0)
                    d_pair = disc_fn(doubled, doubled_labels, kp1, kp2, kp3)
                    n2 = both.shape[0]
                    d_all = type(d_pair)(*(None if v is None else v[:n2] for v in d_pair))
                    d_all_2 = type(d_pair)(*(None if v is None else v[n2:] for v in d_pair))
                else:
                    d_all = disc_fn(both, both_labels, kp1, kp2, kp3)
                    d_all_2 = disc_fn(both, both_labels, kp1, kp2, kp3)
                d_clean = (
                    disc_fn(both, both_labels, 1.0, 1.0, 1.0)
                    if cfg.clean_pass else None
                )

                d_real, d_fake = d_all.wgan[:b], d_all.wgan[b:]
                f_real = d_all.features[:b]
                d_real_2 = d_all_2.wgan[:b]
                f_real_2 = d_all_2.features[:b]

                _, wgan = wgan_losses(d_real, d_fake)
                ct = consistency_term(
                    d_real, d_real_2, f_real, f_real_2,
                    lambda_2=cfg.lambda_ct, factor_m=cfg.factor_m,
                )
                gp, _slopes = gradient_penalty(
                    lambda x: (disc_fn(x, labels, kp1, kp2, kp3).wgan, None),
                    real, fake, rng_mod.next_key("gp"),
                )
                cost = wgan + ct + cfg.lambda_gp * gp
                metrics = {"wgan": wgan, "ct": ct, "gp": gp}
                if cfg.conditional and cfg.acgan:
                    ac = acgan_loss(d_all.acgan[:b], labels)
                    cost = cost + cfg.acgan_scale * ac
                    metrics["acgan"] = ac
                    if d_clean is not None:
                        metrics["acc_real"] = acgan_accuracy(d_clean.acgan[:b], labels)
                        metrics["acc_fake"] = acgan_accuracy(d_clean.acgan[b:], labels)
                metrics["disc_cost"] = cost
                return cost, metrics

    def gen_loss(gen_params, disc_params, key):
        n = cfg.gen_bs_multiple * cfg.batch_size
        with rng_context({"default": key}):
            with apply_context({**gen_params, **disc_params}):
                fake_labels = _rand_labels(rng_mod.next_key("labels"), n)
                fake = gen_fn(n, fake_labels)
                d = disc_fn(fake, fake_labels, kp1, kp2, kp3)
                cost = -jnp.mean(d.wgan)
                if cfg.conditional and cfg.acgan:
                    cost = cost + cfg.acgan_scale_g * acgan_loss(d.acgan, fake_labels)
                return cost

    disc_grad = jax.value_and_grad(disc_loss, has_aux=True)
    gen_grad = jax.value_and_grad(gen_loss)

    # The training iteration is decomposed into substeps so it can run two
    # ways with IDENTICAL numerics (same key derivations from
    # (base_key, state.step, i)):
    #   * fused: step_fn = one XLA program per G-iteration (fastest;
    #     the critic loop is a static python loop — measured +8.8% on v5e
    #     vs lax.scan, and scan bodies with the GP double-backward are also
    #     miscompiled under model-axis sharding),
    #   * unfused (TP-safe): gen_substep + K x critic_substep + bump_step,
    #     each its own jit — required under a model axis because XLA's SPMD
    #     partitioner miscompiles CHAINED grad+update iterations in one
    #     program when any weight is sharded on the 'model' axis
    #     (docs/XLA_GSPMD_SCAN_BUG.md).

    def gen_substep(state: AcganState, base_key):
        """G update (skipped at step 0, reference 'if iteration > 0').
        Does NOT bump state.step."""
        key = jax.random.fold_in(base_key, state.step)
        if spmd_hooks is None:
            gp_full, dp_full = state.gen_params, state.disc_params
        else:
            gp_full = spmd_hooks.gather_gen(state.gen_params)
            dp_full = spmd_hooks.gather_disc(state.disc_params)
        g_cost, g_grads = gen_grad(
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
            AcganState(gen_params, state.disc_params, gen_opt, state.disc_opt, state.step),
            g_cost,
        )

    def critic_substep(state: AcganState, i, real_int, labels, base_key):
        """One critic iteration (i may be a python int or traced scalar).
        Does NOT bump state.step."""
        key = jax.random.fold_in(base_key, state.step)
        dq_key = jax.random.fold_in(key, 5000 + i)
        real = 2.0 * (real_int.astype(jnp.float32) / 256.0 - 0.5)
        real = real + jax.random.uniform(dq_key, real.shape, maxval=1.0 / 128)
        if spmd_hooks is None:
            dp_full, gp_full = state.disc_params, state.gen_params
        else:
            dp_full = spmd_hooks.gather_disc(state.disc_params)
            gp_full = spmd_hooks.gather_gen(state.gen_params)
        (cost, metrics), grads = disc_grad(
            dp_full, gp_full, real, labels,
            jax.random.fold_in(key, i),
        )
        if spmd_hooks is not None:
            grads = spmd_hooks.sync_disc_grads(grads)
            metrics = spmd_hooks.sync_metrics(metrics)
        disc_params, disc_opt = disc_optimizer.update(
            grads, state.disc_opt, state.disc_params, state.step
        )
        return (
            AcganState(state.gen_params, disc_params, state.gen_opt, disc_opt, state.step),
            metrics,
        )

    def bump_step(state: AcganState) -> AcganState:
        return AcganState(
            state.gen_params, state.disc_params, state.gen_opt, state.disc_opt,
            state.step + 1,
        )

    def step_fn(state: AcganState, real_stack, label_stack, base_key):
        """real_stack: [K, B, 3072] int-valued uint8 pixels; label_stack:
        [K, B].  Dequantization + rescale to [-1,1] happens on device
        (reference :201-202)."""
        state, g_cost = gen_substep(state, base_key)
        for i in range(real_stack.shape[0]):
            state, metrics = critic_substep(
                state, i, real_stack[i], label_stack[i], base_key
            )
        metrics["gen_cost"] = g_cost
        return bump_step(state), metrics

    step_fn.gen_substep = gen_substep
    step_fn.critic_substep = critic_substep
    step_fn.bump_step = bump_step
    step_fn.pieces = {
        "gen_grad": gen_grad, "disc_grad": disc_grad,
        "gen_optimizer": gen_optimizer, "disc_optimizer": disc_optimizer,
    }

    def dev_cost_fn(state: AcganState, real_int, labels, key):
        """Discriminator cost on a dev batch (the reference's dev_cost
        metric, CT_gan_cifar_resnet.py:421-428).  Takes raw uint8-valued
        pixels; dequantization matches the train path."""
        real = 2.0 * (real_int.astype(jnp.float32) / 256.0 - 0.5)
        real = real + jax.random.uniform(
            jax.random.fold_in(key, 9), real.shape, maxval=1.0 / 128
        )
        cost, _metrics = disc_loss(
            state.disc_params, state.gen_params, real, labels, key
        )
        return cost

    def sample_fn(state: AcganState, noise, labels, key):
        with rng_context({"default": key}):
            with apply_context(state.gen_params):
                return gen_fn(noise.shape[0], labels, noise=noise)

    def generate_fn(state: AcganState, n: int, key):
        """Random-label samples for IS/FID (reference samples_100, :352-360)."""
        with rng_context({"default": key}):
            with apply_context(state.gen_params):
                labels = _rand_labels(rng_mod.next_key("labels"), n)
                return gen_fn(n, labels), labels

    def init_state(gen_params, disc_params) -> AcganState:
        return AcganState(
            gen_params, disc_params,
            gen_optimizer.init(gen_params), disc_optimizer.init(disc_params),
            jnp.zeros((), jnp.int32),
        )

    return init_state, step_fn, sample_fn, generate_fn, dev_cost_fn
