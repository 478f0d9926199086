"""CIFAR-10 loader (rebuild of ``tflib/cifar10.py`` and the Theano side's
``cifar10_data.py``).

Reads the python-version batch files when a data dir exists; otherwise a
deterministic synthetic set.  Value layout matches the reference exactly:
flat ``[N, 3072]`` uint8, channel-major (C,H,W) pixel order.

* ``load(batch_size, data_dir, n_examples)`` → (train_gen, dev_gen) yielding
  (uint8-valued int arrays, labels) like ``cifar_generator2``
  (tflib/cifar10.py:40-63).
* ``load_normalized`` → float32 in [-0.5, 0.5] NCHW like the Theano loader
  (cifar10_data.py:30-44).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from .iterator import EpochIterator
from .synthetic import synthetic_cifar10

__all__ = ["load", "load_arrays", "load_normalized"]


def _unpickle(path):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="latin1")
    return np.asarray(d["data"], "uint8"), np.asarray(d["labels"], "int64")


def load_arrays(data_dir: str | None = None, n_examples: int | None = None):
    if data_dir and os.path.exists(os.path.join(data_dir, "data_batch_1")):
        xs, ys = [], []
        for i in range(1, 6):
            x, y = _unpickle(os.path.join(data_dir, f"data_batch_{i}"))
            xs.append(x)
            ys.append(y)
        train = (np.concatenate(xs), np.concatenate(ys))
        test = _unpickle(os.path.join(data_dir, "test_batch"))
    else:
        train, test = synthetic_cifar10()
    if n_examples is not None:
        train = (train[0][:n_examples], train[1][:n_examples])
    return {"train": train, "test": test}


def load(batch_size: int, data_dir: str | None = None, n_examples: int | None = None, seed: int = 0):
    d = load_arrays(data_dir, n_examples)

    def make(split, s):
        imgs, labels = d[split]

        def gen():
            it = EpochIterator([imgs, labels], batch_size, seed=s)
            for _ in range(it.batches_per_epoch()):
                yield next(it)

        return gen

    return make("train", seed), make("test", seed + 1)


def load_normalized(data_dir: str | None = None, subset: str = "train"):
    """float32 NCHW in [-0.5, 0.5] + labels (cifar10_data.py:30-44)."""
    d = load_arrays(data_dir)
    imgs, labels = d["train" if subset == "train" else "test"]
    x = imgs.reshape(-1, 3, 32, 32).astype("float32") / 255.0 - 0.5
    return x, labels
