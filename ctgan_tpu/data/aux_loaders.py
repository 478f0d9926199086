"""Auxiliary dataset loaders (rebuild of the LSUN fork's loader collection:
``svhn.py``, ``enwik8.py``, ``mnist_256.py``, ``mnist_binarized.py``,
``small_imagenet_32.py``, ``lsun256.py``/``lsun256_test.py``,
``imagenet_convert.py``, ``audio_dataset.py`` — vestigial in the reference's
CT-GAN entry points but part of the library surface, SURVEY §2c).

All follow the same contract as the main loaders: epoch generators over
NumPy batches, real files when present, deterministic synthetic fallback.
"""

from __future__ import annotations

import os

import numpy as np

from .iterator import EpochIterator
from .mnist import load_arrays as load_mnist_arrays
from .synthetic import synthetic_images

__all__ = [
    "svhn_generator",
    "enwik8_generator",
    "mnist_256_generator",
    "mnist_binarized_generator",
    "small_imagenet_32_generator",
    "lsun256_generator",
    "lsun256_test_generator",
    "convert_image_folder",
    "audio_generator",
]


def svhn_generator(batch_size: int, mat_path: str | None = None, seed: int = 0):
    """SVHN .mat loader (svhn.py): yields (uint8 flat [B, 3072] C-major,
    labels).  Falls back to synthetic 32px color data."""
    if mat_path and os.path.exists(mat_path):
        from scipy.io import loadmat  # scipy ships with sklearn in the image

        d = loadmat(mat_path)
        x = d["X"].transpose(3, 2, 0, 1).reshape(-1, 3072)  # HWCN -> NCHW flat
        y = d["y"].reshape(-1).astype("int64") % 10
    else:
        x, y = synthetic_images(4096, 3, 32, seed=seed)
    it = EpochIterator([x, y], batch_size, seed=seed)

    def gen():
        for _ in range(it.batches_per_epoch()):
            yield next(it)

    return gen


def enwik8_generator(batch_size: int, seq_len: int, path: str | None = None, seed: int = 0):
    """Character-LM batching (enwik8.py:4-31): yields uint8 [B, seq_len]
    windows over the byte stream."""
    if path and os.path.exists(path):
        with open(path, "rb") as f:
            data = np.frombuffer(f.read(), np.uint8)
    else:
        rng = np.random.default_rng(seed)
        # synthetic text-like bytes (ascii letters + space)
        alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)
        data = alphabet[rng.integers(0, len(alphabet), size=1 << 20)]
    n_windows = (len(data) - 1) // seq_len
    windows = data[: n_windows * seq_len].reshape(n_windows, seq_len)
    it = EpochIterator([windows], batch_size, seed=seed)

    def gen():
        for _ in range(it.batches_per_epoch()):
            yield next(it)

    return gen


def mnist_256_generator(batch_size: int, seed: int = 0, n_examples: int | None = None):
    """MNIST quantized to 256 integer levels (mnist_256.py): yields int
    [B, 784] in [0, 255]."""
    d = load_mnist_arrays(n_examples=n_examples)
    x = (d["train"][0] * 255).astype("int32")
    it = EpochIterator([x, d["train"][1]], batch_size, seed=seed)

    def gen():
        for _ in range(it.batches_per_epoch()):
            yield next(it)

    return gen


def mnist_binarized_generator(batch_size: int, seed: int = 0, n_examples: int | None = None):
    """Dynamically-binarized MNIST (mnist_binarized.py): each epoch re-samples
    Bernoulli(x) pixels."""
    d = load_mnist_arrays(n_examples=n_examples)
    x, y = d["train"]
    rng = np.random.default_rng(seed)

    def gen():
        bern = (rng.random(x.shape) < x).astype("float32")
        it = EpochIterator([bern, y], batch_size, seed=seed)
        for _ in range(it.batches_per_epoch()):
            yield next(it)

    return gen


def small_imagenet_32_generator(batch_size: int, data_dir: str | None = None, seed: int = 0):
    """32px small-ImageNet (small_imagenet_32.py) — directory of PNGs or
    synthetic."""
    from .images_dir import image_dir_generator

    return image_dir_generator(data_dir, batch_size, size=32, seed=seed)


def lsun256_generator(batch_size: int, data_dir: str | None = None, seed: int = 0):
    """256px LSUN loader (lsun256.py)."""
    from .images_dir import image_dir_generator

    return image_dir_generator(data_dir, batch_size, size=256, seed=seed)


def lsun256_test_generator(batch_size: int, seed: int = 7):
    """The reference's mock backend: the same two images forever
    (lsun256_test.py:5-18)."""
    from .images_dir import fake_image_generator

    return fake_image_generator(batch_size, size=256, n_unique=2, seed=seed)


def convert_image_folder(src_dir: str, dst_dir: str, size: int = 128) -> int:
    """Center-crop + thumbnail preprocessing (imagenet_convert.py): converts
    every image in ``src_dir`` to ``size``x``size`` PNGs.  Returns count."""
    from PIL import Image

    os.makedirs(dst_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(src_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = Image.open(os.path.join(src_dir, name)).convert("RGB")
        w, h = img.size
        side = min(w, h)
        left, top = (w - side) // 2, (h - side) // 2
        img = img.crop((left, top, left + side, top + side)).resize((size, size))
        img.save(os.path.join(dst_dir, f"{count}.png"))
        count += 1
    return count


def audio_generator(batch_size: int, seq_len: int = 16384, data_dir: str | None = None, seed: int = 0):
    """Audio batching (audio_dataset.py): yields float32 [B, seq_len] in
    [-1, 1].  Real decoding needs a FLAC reader (unavailable here); the
    fallback generates band-limited noise."""
    rng = np.random.default_rng(seed)

    def gen():
        for _ in range(8):
            # simple synthetic audio: sum of random sinusoids + noise
            t = np.arange(seq_len) / 16000.0
            batch = []
            for _ in range(batch_size):
                f = rng.uniform(80, 2000, size=3)
                a = rng.uniform(0.1, 0.4, size=3)
                wave = sum(ai * np.sin(2 * np.pi * fi * t) for fi, ai in zip(f, a))
                wave += rng.normal(0, 0.05, size=seq_len)
                batch.append(np.clip(wave, -1, 1))
            yield np.asarray(batch, "float32")

    return gen
