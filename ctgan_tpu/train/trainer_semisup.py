"""Semi-supervised GAN-classifier trainer.

Rebuild of the Theano training flow (CT_MNIST.py:100-180,
CT_CIFAR.py:139-313, CT_CIFAR-10_TE.py): alternating discriminator/
generator steps with the hand-rolled Adam, exponential parameter averaging
for evaluation, optional temporal-ensembling targets.

TPU redesign: the *pair* of updates (one D batch + one G batch) is a single
fused jitted step; augmentation happens on device inside the step
(ctgan_tpu.data.augment), replacing the reference's per-epoch host Python
loop (SURVEY §3.3's "hot-loop hazard").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import apply_context, rng_context
from ..losses.semisup import (
    classification_error,
    ct_cifar_unlabeled_loss,
    ct_mnist_unlabeled_loss,
    ct_te_unlabeled_loss,
    feature_matching_abs,
    feature_matching_sq,
    labeled_loss,
)
from . import optim

__all__ = ["SslConfig", "SslState", "make_ssl_trainer"]


@dataclass(frozen=True)
class SslConfig:
    variant: str = "mnist"          # 'mnist' | 'cifar' | 'te'
    unlabeled_weight: float = 1.0   # args.unlabeled_weight
    lr: float = 0.003               # MNIST lr (CT_MNIST.py:140); CIFAR 3e-4
    lambda_2: float = 0.1           # CT_MNIST.py:15 (TE: 1.0)
    factor_m: float = 0.0
    ema_rate: float = 1e-4          # disc_avg_updates (CT_MNIST.py:105)
    mom1: float = 0.5               # adam beta1 (CT_MNIST.py:103)


class SslState(NamedTuple):
    disc_params: dict
    gen_params: dict
    disc_opt: dict
    gen_opt: dict
    avg_params: dict   # EMA of disc params, used at test time
    step: jax.Array


def make_ssl_trainer(
    classifier_fn: Callable,  # (x, deterministic=False) -> ClassifierOut
    generator_fn: Callable,   # (n) -> flat images
    cfg: SslConfig,
):
    disc_optimizer = optim.adam_theano(cfg.lr, cfg.mom1)
    gen_optimizer = optim.adam_theano(cfg.lr, cfg.mom1)

    def disc_loss(disc_params, gen_params, x_lab, labels, x_unl, targets, key):
        with rng_context({"default": key}):
            with apply_context({**disc_params, **gen_params}):
                out_lab = classifier_fn(x_lab)
                out_unl = classifier_fn(x_unl)
                fake = generator_fn(x_unl.shape[0])
                out_fake = classifier_fn(fake)

                l_lab = labeled_loss(out_lab.logits, labels)
                if cfg.variant == "mnist":
                    out_unl2 = classifier_fn(x_unl)
                    l_unl, ct = ct_mnist_unlabeled_loss(
                        out_unl.logits, out_unl2.logits,
                        out_unl.features, out_unl2.features,
                        out_fake.logits,
                        lambda_2=cfg.lambda_2, factor_m=cfg.factor_m,
                    )
                elif cfg.variant == "cifar":
                    out_unl2 = classifier_fn(x_unl)
                    l_unl = ct_cifar_unlabeled_loss(
                        out_unl.logits, out_unl2.logits,
                        out_unl.features, out_unl2.features,
                        out_fake.logits,
                    )
                    ct = jnp.zeros(())
                elif cfg.variant == "te":
                    target_probs, target_feats = targets
                    l_unl = ct_te_unlabeled_loss(
                        out_unl.logits, out_unl.features,
                        target_probs, target_feats, out_fake.logits,
                        lambda_2=cfg.lambda_2, factor_m=cfg.factor_m,
                    )
                    ct = jnp.zeros(())
                else:
                    raise ValueError(cfg.variant)

                cost = l_lab + cfg.unlabeled_weight * l_unl
                train_err = classification_error(out_lab.logits, labels)
                metrics = {
                    "loss_lab": l_lab, "loss_unl": l_unl,
                    "train_err": train_err, "loss_ct": ct,
                }
                aux = (metrics, jax.nn.softmax(out_unl.logits), out_unl.features)
                return cost, aux

    def gen_loss(gen_params, disc_params, x_unl, key):
        with rng_context({"default": key}):
            with apply_context({**disc_params, **gen_params}):
                fake = generator_fn(x_unl.shape[0])
                out_fake = classifier_fn(fake)
                out_real = classifier_fn(x_unl)
                if cfg.variant == "cifar":
                    # L1 feature matching (CT_CIFAR.py:151-155)
                    return feature_matching_abs(out_fake.fm_features, out_real.fm_features)
                return feature_matching_sq(out_fake.fm_features, out_real.fm_features)

    disc_grad = jax.value_and_grad(disc_loss, has_aux=True)
    gen_grad = jax.value_and_grad(gen_loss)

    def step_fn(state: SslState, x_lab, labels, x_unl, x_unl2, targets, base_key):
        """One fused (D update, EMA update, G update) step.

        ``x_unl`` / ``x_unl2`` are the two independent unlabeled streams
        (CT_CIFAR.py:277-288: D trains on stream 1, G on stream 2);
        ``targets`` is ``(probs, feats)`` for the 'te' variant else None.
        """
        key = jax.random.fold_in(base_key, state.step)
        (cost, (metrics, unl_probs, unl_feats)), d_grads = disc_grad(
            state.disc_params, state.gen_params,
            x_lab, labels, x_unl, targets, jax.random.fold_in(key, 0),
        )
        disc_params, disc_opt = disc_optimizer.update(
            d_grads, state.disc_opt, state.disc_params, state.step
        )
        # a += rate*(p - a)  (CT_MNIST.py:105)
        avg_params = {
            k: a + cfg.ema_rate * (disc_params[k] - a)
            for k, a in state.avg_params.items()
        }
        g_cost, g_grads = gen_grad(
            state.gen_params, disc_params, x_unl2, jax.random.fold_in(key, 1)
        )
        gen_params, gen_opt = gen_optimizer.update(
            g_grads, state.gen_opt, state.gen_params, state.step
        )
        metrics["loss_gen"] = g_cost
        new_state = SslState(
            disc_params, gen_params, disc_opt, gen_opt, avg_params, state.step + 1
        )
        return new_state, (metrics, unl_probs, unl_feats)

    def multi_step_fn(state: SslState, x_lab_s, labels_s, x_unl_s, x_unl2_s, targets_s, base_key):
        """Scan ``step_fn`` over T stacked batches — one device dispatch for a
        whole chunk of the epoch (the reference paid a Theano function call
        per batch; on TPU per-call latency would dominate these small
        classifier steps).

        Stacked shapes: x_lab_s [T,B,...], labels_s [T,B], x_unl_s/x_unl2_s
        [T,B,...], targets_s None or (probs [T,B,10], feats [T,B,F]).
        Returns (state, (metrics averaged over T, probs [T,B,10], feats)).
        """

        def body(st, inp):
            if targets_s is None:
                xl, yl, xu, xu2 = inp
                tg = None
            else:
                xl, yl, xu, xu2, tp, tf = inp
                tg = (tp, tf)
            st, (metrics, probs, feats) = step_fn(st, xl, yl, xu, xu2, tg, base_key)
            return st, (metrics, probs, feats)

        xs = (
            (x_lab_s, labels_s, x_unl_s, x_unl2_s)
            if targets_s is None
            else (x_lab_s, labels_s, x_unl_s, x_unl2_s, targets_s[0], targets_s[1])
        )
        state, (mstack, probs, feats) = jax.lax.scan(body, state, xs)
        metrics = {k: jnp.mean(v) for k, v in mstack.items()}
        return state, (metrics, probs, feats)

    def test_fn(state: SslState, x, labels):
        """Error with EMA-averaged params, deterministic passes
        (CT_MNIST.py:106-112 disc_avg_givens + deterministic=True)."""
        with rng_context({"default": jax.random.PRNGKey(0)}):
            with apply_context({**state.avg_params, **state.gen_params}):
                out = classifier_fn(x, deterministic=True)
        return classification_error(out.logits, labels)

    def init_state(disc_params: dict, gen_params: dict) -> SslState:
        return SslState(
            disc_params=disc_params,
            gen_params=gen_params,
            disc_opt=disc_optimizer.init(disc_params),
            gen_opt=gen_optimizer.init(gen_params),
            # avg starts at 0·p (CT_MNIST.py:104: shared(0.*p))
            avg_params={k: jnp.zeros_like(v) for k, v in disc_params.items()},
            step=jnp.zeros((), jnp.int32),
        )

    return init_state, step_fn, test_fn, multi_step_fn
