"""Sample generation from a trained checkpoint — the serving path.

The reference had no inference entry point (sampling was inlined in the
training loops).  This app loads any GAN checkpoint written by the trainer
apps and generates batched samples: an image grid, a raw ``.npz`` of flat
samples, or a continuous batch-serving loop for throughput measurement.

    python -m ctgan_tpu.apps.generate --model cifar_resnet \
        --ckpt runs/ct_gan_cifar_resnet/ckpt/ckpt_1000.npz --n 100
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import apply_context, rng_context
from ..utils.checkpoint import load_checkpoint
from .common import parse_config, save_sample_grid


@dataclass(frozen=True)
class Config:
    model: str = "cifar_resnet"  # mnist | cifar | cifar_resnet | good64 | lsun128
    ckpt: str = ""
    n: int = 100
    batch: int = 100
    seed: int = 0
    out_prefix: str = "generated"
    save_npz: bool = False
    dim: int = 128


def _model_entry(cfg: Config):
    """Returns (gen_call(n, key) -> flat samples, (C, H, W), value_range)."""
    if cfg.model == "mnist":
        from ..models import dcgan

        def call(params, n, key):
            with rng_context({"default": key}):
                with apply_context(params):
                    return dcgan.mnist_generator(n, dim=cfg.dim if cfg.dim != 128 else 64)

        return call, (1, 28, 28), (0.0, 1.0)
    if cfg.model == "cifar":
        from ..models import dcgan

        def call(params, n, key):
            with rng_context({"default": key}):
                with apply_context(params):
                    return dcgan.cifar_generator(n, dim=cfg.dim)

        return call, (3, 32, 32), (-1.0, 1.0)
    if cfg.model == "cifar_resnet":
        from ..models import resnet_cifar

        mcfg = resnet_cifar.ResnetCifarConfig(dim_g=cfg.dim, dim_d=cfg.dim)

        def call(params, n, key):
            with rng_context({"default": key}):
                with apply_context(params):
                    labels = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, 10)
                    return resnet_cifar.generator(n, labels, cfg=mcfg)

        return call, (3, 32, 32), (-1.0, 1.0)
    if cfg.model == "good64":
        from ..models import good64

        def call(params, n, key):
            with rng_context({"default": key}):
                with apply_context(params):
                    return good64.good64_generator(n, dim=cfg.dim if cfg.dim != 128 else 64)

        return call, (3, 64, 64), (-1.0, 1.0)
    if cfg.model == "lsun128":
        from ..models import lsun128

        def call(params, n, key):
            with rng_context({"default": key}):
                with apply_context(params):
                    return lsun128.lsun128_generator(n)

        return call, (3, 128, 128), (-1.0, 1.0)
    raise ValueError(f"unknown model {cfg.model!r}")


def load_gen_params(ckpt_path: str) -> dict:
    blob = load_checkpoint(ckpt_path)
    if "state" in blob and "gen_params" in blob["state"]:
        return {k: jnp.asarray(v) for k, v in blob["state"]["gen_params"].items()}
    if "gen_params" in blob:
        return {k: jnp.asarray(v) for k, v in blob["gen_params"].items()}
    # raw param dict (disc_params.npz-style dump)
    return {k: jnp.asarray(v) for k, v in blob.items() if hasattr(v, "shape")}


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse_config(Config, argv)
    if not cfg.ckpt:
        raise SystemExit("--ckpt required")
    params = load_gen_params(cfg.ckpt)
    call, chw, vrange = _model_entry(cfg)
    jit_call = jax.jit(call, static_argnums=1)

    outs = []
    for i in range(0, cfg.n, cfg.batch):
        n = min(cfg.batch, cfg.n - i)
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), i)
        outs.append(np.asarray(jit_call(params, n, key)))
    samples = np.concatenate(outs)[: cfg.n]

    grid_path = f"{cfg.out_prefix}.png"
    save_sample_grid(samples[: min(cfg.n, 100)], chw, grid_path, value_range=vrange)
    print(f"wrote {grid_path} ({min(cfg.n, 100)} samples)")
    if cfg.save_npz:
        np.savez(f"{cfg.out_prefix}.npz", samples=samples)
        print(f"wrote {cfg.out_prefix}.npz {samples.shape}")
    return samples


if __name__ == "__main__":
    main()
