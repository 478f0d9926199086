"""MNIST loader (rebuild of ``tflib/mnist.py``).

Reads ``mnist.pkl.gz`` (the classic three-split pickle) from ``path`` or
``/tmp/mnist.pkl.gz`` when available; otherwise a deterministic synthetic set
(this environment has no network — the reference downloaded from
``iro.umontreal.ca``, tflib/mnist.py:90-98).

API mirrors the reference: ``load(batch_size, test_batch_size, n_examples)``
returns ``(train_gen, dev_gen, test_gen)`` generator factories yielding
``(images float32 [B,784] in [0,1], labels)``; ``n_examples`` selects the
first-N training subset (``mnist_generator2``, tflib/mnist.py:48-88).
"""

from __future__ import annotations

import gzip
import os
import pickle

import numpy as np

from .iterator import EpochIterator
from .synthetic import synthetic_mnist

__all__ = ["load", "load_arrays"]


def load_arrays(path: str | None = None, n_examples: int | None = None):
    """Returns dict with train/dev/test (images, labels) NumPy arrays."""
    candidates = [path, "/tmp/mnist.pkl.gz", os.path.expanduser("~/data/mnist.pkl.gz")]
    filepath = next((p for p in candidates if p and os.path.exists(p)), None)
    if filepath:
        with gzip.open(filepath, "rb") as f:
            train, dev, test = pickle.load(f, encoding="latin1")
        train = (np.asarray(train[0], "float32"), np.asarray(train[1], "int64"))
        dev = (np.asarray(dev[0], "float32"), np.asarray(dev[1], "int64"))
        test = (np.asarray(test[0], "float32"), np.asarray(test[1], "int64"))
    else:
        train, dev, test = synthetic_mnist()
    if n_examples is not None:
        train = (train[0][:n_examples], train[1][:n_examples])
    return {"train": train, "dev": dev, "test": test}


def load(batch_size: int, test_batch_size: int | None = None, n_examples: int | None = None, path: str | None = None, seed: int = 0):
    """(train_gen, dev_gen, test_gen) factories (tflib/mnist.py:100-104)."""
    test_batch_size = test_batch_size or batch_size
    d = load_arrays(path, n_examples)

    def make(split, bs, s):
        imgs, labels = d[split]

        def gen():
            it = EpochIterator([imgs, labels], bs, seed=s)
            for _ in range(it.batches_per_epoch()):
                yield next(it)

        return gen

    return make("train", batch_size, seed), make("dev", test_batch_size, seed + 1), make(
        "test", test_batch_size, seed + 2
    )
