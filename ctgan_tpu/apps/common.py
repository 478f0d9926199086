"""Shared app plumbing: argument parsing, device setup, sample saving.

The reference's "CLI" is module-level UPPERCASE constants per script
(CT_gan_cifar.py:34-43) plus argparse in the Theano classifiers.  Here every
app is a dataclass config exposed through argparse with the reference's
hyperparameter names, echoed at startup via ``print_model_settings``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

__all__ = ["parse_config", "setup_out_dir", "save_sample_grid", "maybe_mesh"]


def parse_config(cls, argv=None):
    """Build argparse from a dataclass; returns an instance."""
    parser = argparse.ArgumentParser(description=cls.__doc__)
    for f in dataclasses.fields(cls):
        arg = "--" + f.name
        if f.type in ("bool", bool):
            parser.add_argument(arg, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=f.default)
        else:
            parser.add_argument(arg, type=type(f.default), default=f.default)
    ns = parser.parse_args(argv)
    return cls(**vars(ns))


def setup_out_dir(cfg) -> str:
    out = getattr(cfg, "out_dir", "runs/default")
    os.makedirs(out, exist_ok=True)
    from ctgan_tpu.core import print_model_settings

    print_model_settings({k.upper(): v for k, v in dataclasses.asdict(cfg).items()})
    return out


def save_sample_grid(samples_flat, shape_chw, path, value_range=(-1.0, 1.0)):
    """Flat C-major samples -> grid png, rescaling like the reference
    ((x+1)*255/2 for tanh outputs, CT_gan_cifar.py:163)."""
    from ctgan_tpu.utils import save_images

    lo, hi = value_range
    x = (np.asarray(samples_flat, dtype="float32") - lo) / (hi - lo)
    c, h, w = shape_chw
    imgs = x.reshape(-1, c, h, w)
    if c == 1:
        imgs = imgs[:, 0]
    save_images(imgs, path)


def maybe_mesh(n_devices: int | None = None):
    """All-device data mesh when >1 device is available, else None."""
    import jax

    devs = jax.devices()
    if len(devs) <= 1:
        return None
    from ctgan_tpu.parallel import make_mesh

    n = n_devices or len(devs)
    return make_mesh(devs[:n], data=n, model=1)
