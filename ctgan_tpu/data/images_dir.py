"""Directory-of-images loaders (rebuild of ``tflib/small_imagenet.py``,
``LSUN_bedrooms/tflib/imagenet.py``, ``lsun_bedrooms.py``, ``lsun256*.py``).

Host-side decode (PIL) feeding a prefetch queue; images yield as int NCHW-flat
to match the reference trainers' input contract.  ``fake_image_generator``
mirrors ``lsun256_test.py:5-18`` — the same few images forever, the repo's
only mock backend.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator

import numpy as np

from .synthetic import synthetic_images

__all__ = ["image_dir_generator", "fake_image_generator", "prefetch"]


def _list_images(data_dir: str) -> list[str]:
    exts = (".png", ".jpg", ".jpeg")
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.lower().endswith(exts)
    )


def _decode(path: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size))
    arr = np.asarray(img, dtype="uint8")  # HWC
    return arr.transpose(2, 0, 1)  # CHW


def image_dir_generator(
    data_dir: str | None,
    batch_size: int,
    size: int = 64,
    *,
    random_flip: bool = True,
    seed: int = 0,
    synthetic_n: int = 4096,
) -> Iterator[np.ndarray]:
    """Infinite epochs of shuffled [B, 3, size, size] uint8 batches.

    Falls back to the synthetic set when ``data_dir`` is missing (zero-egress
    environment; reference required a manual download,
    LSUN_bedrooms/tflib/imagenet.py:42-47).
    """
    rng = np.random.default_rng(seed)
    files = _list_images(data_dir) if data_dir and os.path.isdir(data_dir) else None
    if not files:
        flat, _ = synthetic_images(synthetic_n, 3, size, seed=seed)
        data = flat.reshape(-1, 3, size, size)
        while True:
            idx = rng.permutation(len(data))
            for i in range(0, len(data) - batch_size + 1, batch_size):
                batch = data[idx[i : i + batch_size]].copy()
                if random_flip:
                    flips = rng.random(batch_size) > 0.5
                    batch[flips] = batch[flips, :, :, ::-1]
                yield batch
    else:
        while True:
            order = rng.permutation(len(files))
            batch = []
            for j in order:
                batch.append(_decode(files[j], size))
                if len(batch) == batch_size:
                    arr = np.stack(batch)
                    if random_flip:
                        flips = rng.random(batch_size) > 0.5
                        arr[flips] = arr[flips, :, :, ::-1]
                    yield arr
                    batch = []


def fake_image_generator(batch_size: int, size: int = 256, n_unique: int = 2, seed: int = 7) -> Iterator[np.ndarray]:
    """Epochs of the same ``n_unique`` images forever (lsun256_test.py:5-18)."""
    flat, _ = synthetic_images(n_unique, 3, size, seed=seed)
    data = flat.reshape(-1, 3, size, size)
    tiled = np.tile(data, (max(1, batch_size // n_unique + 1), 1, 1, 1))[:batch_size]
    while True:
        yield tiled.copy()


def prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch so host decode overlaps device compute —
    the redesign of the reference's synchronous feed_dict boundary."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
