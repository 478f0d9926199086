"""One-hot toy experiments (rebuild of LSUN_bedrooms/wgan_onehots.py and
onehot_autoencoder.py — vestigial upstream experiments kept for surface
parity).

* ``onehot_wgan`` — gumbel-softmax one-hot WGAN: multiplicative-gated MLP
  generator over 512-way one-hots, MLP critic, WGAN-GP loss.
* ``onehot_autoencoder`` — linear 32-d bottleneck autoencoder over one-hots
  trained with softmax CE.

Run: ``python -m ctgan_tpu.apps.onehot_toys --which wgan`` (or ``ae``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import apply_context, init_context, rng_context, split_params
from ..core import rng as rng_mod
from ..losses.gan import gradient_penalty, wgan_losses
from ..ops import leaky_relu, linear, relu
from ..train import optim
from ..utils import MetricLogger
from .common import parse_config, setup_out_dir


@dataclass(frozen=True)
class Config:
    which: str = "wgan"      # wgan | ae
    BATCH_SIZE: int = 128
    ITERS: int = 10000
    OUTPUT_DIM: int = 512
    DIM: int = 256
    seed: int = 0
    out_dir: str = "runs/onehot_toys"


def gumbel_softmax_logits(logits, temp, key):
    """Gumbel noise + temperature, minus the final softmax
    (wgan_onehots.py:32-37)."""
    u = jax.random.uniform(key, logits.shape, minval=0.1, maxval=0.99)
    return (logits + -jnp.log(-jnp.log(u))) / temp


def _m_layer(name, n_in, n_out, x):
    """Multiplicative gate: linear(x) * linear2(x) (wgan_onehots.py:41-48)."""
    return linear(name + ".Linear", n_in, n_out, x) * linear(name + ".Linear2", n_in, n_out, x)


def onehot_generator(n_samples, output_dim=512, dim=256):
    noise = jax.random.normal(rng_mod.next_key("noise"), (n_samples, 128))
    out = relu(linear("Generator.1.Linear", 128, dim, noise))
    out = relu(linear("Generator.2.Linear", dim, dim, out))
    out = _m_layer("Generator.3", dim, dim, out)
    out = _m_layer("Generator.4", dim, dim, out)
    out = _m_layer("Generator.5", dim, dim, out)
    out = linear("Generator.Out", dim, output_dim, out)
    return jax.nn.softmax(gumbel_softmax_logits(out, 0.1, rng_mod.next_key("gumbel")))


def onehot_critic(x, output_dim=512, dim=256):
    out = leaky_relu(linear("Discriminator.1.Linear", output_dim, dim, x))
    out = leaky_relu(linear("Discriminator.2.Linear", dim, dim, out))
    logits = linear("Discriminator.Out", dim, 1, out)
    return logits.reshape(-1), out


def autoencoder(x, output_dim=256, bottleneck=32):
    code = linear("Discriminator.2", output_dim, bottleneck, x)
    return linear("Discriminator.Out", bottleneck, output_dim, code)


def _onehot_batch(rng, batch, dim):
    idx = rng.integers(0, dim, size=batch)
    return np.eye(dim, dtype="float32")[idx]


def run_wgan(cfg: Config, logger: MetricLogger):
    with init_context(seed=cfg.seed) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            onehot_critic(onehot_generator(2, cfg.OUTPUT_DIM, cfg.DIM), cfg.OUTPUT_DIM, cfg.DIM)
    gp_, dp_, _ = split_params(ctx.params, "Generator", "Discriminator")
    opt_g, opt_d = optim.adam(1e-4, 0.5, 0.9), optim.adam(1e-4, 0.5, 0.9)
    sg, sd = opt_g.init(gp_), opt_d.init(dp_)

    def d_loss(dp, gp, real, key):
        with rng_context({"default": key}):
            with apply_context({**gp, **dp}):
                fake = onehot_generator(real.shape[0], cfg.OUTPUT_DIM, cfg.DIM)
                d_real, _ = onehot_critic(real, cfg.OUTPUT_DIM, cfg.DIM)
                d_fake, _ = onehot_critic(fake, cfg.OUTPUT_DIM, cfg.DIM)
                _, cost = wgan_losses(d_real, d_fake)
                gpen, _ = gradient_penalty(
                    lambda x: onehot_critic(x, cfg.OUTPUT_DIM, cfg.DIM),
                    real, fake, rng_mod.next_key("gp"),
                )
                return cost + 10.0 * gpen

    def g_loss(gp, dp, key):
        with rng_context({"default": key}):
            with apply_context({**gp, **dp}):
                fake = onehot_generator(cfg.BATCH_SIZE, cfg.OUTPUT_DIM, cfg.DIM)
                return -jnp.mean(onehot_critic(fake, cfg.OUTPUT_DIM, cfg.DIM)[0])

    @jax.jit
    def step(gp, dp, sg, sd, real, key, i):
        dc, dg = jax.value_and_grad(d_loss)(dp, gp, real, jax.random.fold_in(key, 2 * i))
        dp, sd = opt_d.update(dg, sd, dp, i)
        gc, gg = jax.value_and_grad(g_loss)(gp, dp, jax.random.fold_in(key, 2 * i + 1))
        gp, sg = opt_g.update(gg, sg, gp, i)
        return gp, dp, sg, sd, dc, gc

    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    for i in range(cfg.ITERS):
        real = jnp.asarray(_onehot_batch(rng, cfg.BATCH_SIZE, cfg.OUTPUT_DIM))
        gp_, dp_, sg, sd, dc, gc = step(gp_, dp_, sg, sd, real, key, jnp.asarray(i))
        logger.plot("disc_cost", dc)
        logger.plot("gen_cost", gc)
        logger.tick()
        if i % 100 == 99:
            logger.flush()
    return gp_, dp_


def run_ae(cfg: Config, logger: MetricLogger):
    dim = 256
    with init_context(seed=cfg.seed) as ctx:
        autoencoder(jnp.zeros((2, dim)), dim)
    params = ctx.params
    opt = optim.adam(1e-4, 0.5, 0.9)
    s = opt.init(params)

    def loss(p, real):
        with apply_context(p):
            logits = autoencoder(real, dim)
        return -jnp.mean(jnp.sum(real * jax.nn.log_softmax(logits), axis=1))

    @jax.jit
    def step(p, s, real, i):
        c, g = jax.value_and_grad(loss)(p, real)
        p, s = opt.update(g, s, p, i)
        return p, s, c

    rng = np.random.default_rng(cfg.seed)
    for i in range(cfg.ITERS):
        real = jnp.asarray(_onehot_batch(rng, cfg.BATCH_SIZE, dim))
        for _ in range(8):  # disc_iters=8 (onehot_autoencoder.py:76)
            params, s, c = step(params, s, real, jnp.asarray(i))
        logger.plot("disc_cost", c)
        logger.tick()
        if i % 100 == 99:
            logger.flush()
    return params


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse_config(Config, argv)
    logger = MetricLogger(setup_out_dir(cfg))
    if cfg.which == "wgan":
        return run_wgan(cfg, logger)
    return run_ae(cfg, logger)


if __name__ == "__main__":
    main()
