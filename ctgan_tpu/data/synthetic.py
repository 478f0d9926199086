"""Deterministic synthetic datasets.

The reference assumes MNIST/CIFAR files on disk (hard-coded paths,
CT_gan_cifar.py:26-28).  This environment is zero-egress, so every loader
falls back to a *deterministic, class-structured* synthetic set: each class
is a distinct mixture of spatial gaussian blobs, so discriminators/classifiers
have real signal to learn and end-to-end training tests are meaningful.  Real files
are used whenever present.
"""

from __future__ import annotations

import numpy as np

__all__ = ["synthetic_images", "synthetic_mnist", "synthetic_cifar10"]


def synthetic_images(
    n: int,
    channels: int,
    size: int,
    n_classes: int = 10,
    seed: int = 1234,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (uint8 images [N, C*H*W] flat C-major, int labels [N]).

    Each class c gets k class-specific blob centers; images are blob mixtures
    plus noise — cheap, deterministic, and classifiable.
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=n).astype("int64")
    yy, xx = np.mgrid[0:size, 0:size].astype("float32") / size
    # Class prototypes are seeded by the dataset *shape* only, so different
    # splits (different sampling seeds) share the same class definitions.
    proto_rng = np.random.default_rng((n_classes, channels, size))
    centers = proto_rng.uniform(0.15, 0.85, size=(n_classes, 3, 2)).astype("float32")
    widths = proto_rng.uniform(0.05, 0.15, size=(n_classes, 3)).astype("float32")
    base = np.zeros((n_classes, size, size), dtype="float32")
    for c in range(n_classes):
        for b in range(3):
            cy, cx = centers[c, b]
            base[c] += np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * widths[c, b] ** 2)
            )
    base /= base.max(axis=(1, 2), keepdims=True)
    imgs = base[labels]  # [N, H, W]
    imgs = imgs[:, None, :, :].repeat(channels, axis=1)
    if channels == 3:
        tint = proto_rng.uniform(0.5, 1.0, size=(n_classes, 3, 1, 1)).astype("float32")
        imgs = imgs * tint[labels]
    noise = rng.normal(0, 0.08, size=imgs.shape).astype("float32")
    imgs = np.clip(imgs + noise, 0.0, 1.0)
    flat = (imgs * 255).astype("uint8").reshape(n, channels * size * size)
    return flat, labels


def synthetic_mnist(n_train=50000, n_valid=10000, n_test=10000, seed=1234):
    """(train_x, train_y), (valid_x, valid_y), (test_x, test_y) with x in
    [0,1] float32 [N,784] — the mnist.pkl.gz format."""
    out = []
    for i, n in enumerate((n_train, n_valid, n_test)):
        flat, labels = synthetic_images(n, 1, 28, seed=seed + i)
        out.append((flat.astype("float32") / 255.0, labels))
    return tuple(out)


def synthetic_cifar10(n_train=50000, n_test=10000, seed=4321):
    """(train_x_uint8_flat[N,3072], train_y), (test_x, test_y) — the
    cifar-10-batches-py value layout (C-major uint8)."""
    tr = synthetic_images(n_train, 3, 32, seed=seed)
    te = synthetic_images(n_test, 3, 32, seed=seed + 1)
    return tr, te
