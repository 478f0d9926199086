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

__all__ = [
    "parse_config", "setup_out_dir", "save_sample_grid", "maybe_mesh",
    "pick_scorer",
]


class _FlatInception:
    """Adapts Inception2015 (NHWC/NCHW 4-D input) to the apps' flat
    [N, C*H*W] C-major int-valued sample arrays."""

    comparable = True  # scores comparable to the reference's IS artifacts

    def __init__(self, inc, channels: int, size: int):
        self._inc = inc
        self._shape = (channels, size, size)

    def _unflatten(self, images):
        arr = np.asarray(images, np.float32).reshape(-1, *self._shape)
        if self._shape[0] == 1:
            arr = arr.repeat(3, axis=1)  # Inception needs 3 channels
        return arr

    def inception_score(self, images, splits: int = 10):
        return self._inc.inception_score(self._unflatten(images), splits=splits)

    def fid(self, real_images, fake_images):
        return self._inc.fid(
            self._unflatten(real_images), self._unflatten(fake_images)
        )


def pick_scorer(channels: int, size: int, out_dir: str, train_data=None):
    """Prefer the reference-comparable Inception-2015 scorer when a weight
    file is available (path via $CTGAN_INCEPTION_PB or /tmp/imagenet/, see
    eval.inception2015); otherwise fall back to the self-contained
    TrainedScorer.  Returns an object with inception_score()/fid() over flat
    [N, C*H*W] int-valued images, plus a ``comparable`` flag."""
    from ..eval import Inception2015, TrainedScorer, find_inception_file

    path = find_inception_file()
    if path is not None:
        print(f"IS scorer: Inception-2015 frozen graph from {path} "
              "(scores comparable to the reference)")
        return _FlatInception(Inception2015(path), channels, size)
    scorer = TrainedScorer(channels, size, cache_path=f"{out_dir}/scorer.npz")
    scorer.comparable = False
    if scorer.params is None and train_data is not None:
        print("IS scorer: training self-contained classifier scorer "
              "(supply $CTGAN_INCEPTION_PB for reference-comparable scores)")
        scorer.fit(train_data[0], train_data[1], epochs=3)
    return scorer


def parse_config(cls, argv=None):
    """Build argparse from a dataclass; returns an instance.

    Also the central opt-in point for the persistent XLA compilation cache
    (utils.compile_cache) so every app's crash/resume skips recompiles."""
    from ctgan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
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


def maybe_mesh(n_devices: int | None = None, model_axis: int = 1):
    """All-device mesh when >1 device is available, else None.

    ``model_axis > 1`` adds a tensor-parallel axis; the caller must then run
    the training step through ``train.make_unfused_step`` (one grad+update
    per program) — the fused step is miscompiled under a model axis by the
    current XLA SPMD partitioner (docs/XLA_GSPMD_SCAN_BUG.md)."""
    import jax

    devs = jax.devices()
    if len(devs) <= 1:
        return None
    from ctgan_tpu.parallel import make_mesh

    n = n_devices or len(devs)
    if n < model_axis:
        raise ValueError(
            f"model_axis={model_axis} needs at least that many devices; "
            f"only {n} available (of {len(devs)} total)"
        )
    n -= n % model_axis
    return make_mesh(devs[:n], data=n // model_axis, model=model_axis)
