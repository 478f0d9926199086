"""Sample-grid image writer (rebuild of ``tflib/save_images.py:9-38``).

Same behaviour: floats in [0,1] are scaled to [0,255]; auto near-square grid;
accepts [N, H, W] grayscale or [N, C, H, W] color (BCHW like the reference,
transposed internally).
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_grid", "save_images", "img_tile", "img_stretch"]


def img_stretch(img: np.ndarray) -> np.ndarray:
    """Stretch values to [0, 1] (Theano_classifier/plotting.py img_stretch)."""
    img = np.asarray(img, dtype="float64")
    lo, hi = img.min(), img.max()
    if hi > lo:
        img = (img - lo) / (hi - lo)
    return img


def img_tile(
    imgs: np.ndarray,
    *,
    aspect_ratio: float = 1.0,
    border: int = 1,
    border_color: float = 0.0,
    stretch: bool = False,
) -> np.ndarray:
    """Tile [N, H, W(, C)] images with borders
    (Theano_classifier/plotting.py:7-58)."""
    imgs = np.asarray(imgs, dtype="float64")
    if stretch:
        imgs = img_stretch(imgs)
    n = len(imgs)
    tile_h = int(np.ceil(np.sqrt(n * aspect_ratio)))
    tile_w = int(np.ceil(n / tile_h))
    h, w = imgs.shape[1:3]
    extra = imgs.shape[3:]
    out = np.full(
        (tile_h * h + (tile_h - 1) * border, tile_w * w + (tile_w - 1) * border) + extra,
        border_color,
    )
    for i, im in enumerate(imgs):
        r, c = divmod(i, tile_w)
        y, x = r * (h + border), c * (w + border)
        out[y : y + h, x : x + w] = im
    return out


def make_grid(x: np.ndarray) -> np.ndarray:
    """[N,H,W] or [N,C,H,W] -> one HW(C) uint8 grid image."""
    x = np.asarray(x)
    if x.dtype.kind == "f":
        x = (255.99 * np.clip(x, 0.0, 1.0)).astype("uint8")
    n_samples = x.shape[0]
    rows = int(np.sqrt(n_samples))
    while n_samples % rows != 0:
        rows -= 1
    cols = n_samples // rows

    if x.ndim == 4:  # BCHW -> BHWC
        x = x.transpose(0, 2, 3, 1)
        h, w, c = x.shape[1:]
        img = np.zeros((h * rows, w * cols, c), dtype="uint8")
    else:
        h, w = x.shape[1:]
        img = np.zeros((h * rows, w * cols), dtype="uint8")

    for n, sample in enumerate(x):
        i, j = n % cols, n // cols
        img[j * h : j * h + h, i * w : i * w + w] = sample
    return img


def save_images(x: np.ndarray, save_path: str) -> None:
    from PIL import Image

    Image.fromarray(make_grid(x)).save(save_path)
