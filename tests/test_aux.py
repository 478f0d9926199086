"""Aux loaders, handwriting utils, tiling, LSUV init."""

import jax
import jax.numpy as jnp
import numpy as np

from ctgan_tpu.core import init_context
from ctgan_tpu.data.aux_loaders import (
    audio_generator,
    enwik8_generator,
    lsun256_test_generator,
    mnist_256_generator,
    mnist_binarized_generator,
    small_imagenet_32_generator,
    svhn_generator,
)
from ctgan_tpu.ops import linear
from ctgan_tpu.ops.lsuv import lsuv_init
from ctgan_tpu.utils.handwriting import normalize_strokes, render_strokes, strokes_to_points
from ctgan_tpu.utils.images import img_stretch, img_tile


def test_svhn_generator():
    imgs, labels = next(iter(svhn_generator(16)()))
    assert imgs.shape == (16, 3072)
    assert labels.shape == (16,)


def test_enwik8_generator():
    batch = next(iter(enwik8_generator(8, 64)()))
    assert batch.shape == (8, 64)
    assert batch.dtype == np.uint8


def test_mnist_256_and_binarized():
    imgs, _ = next(iter(mnist_256_generator(8, n_examples=64)()))
    assert imgs.dtype == np.int32
    assert 0 <= imgs.min() and imgs.max() <= 255
    bim, _ = next(iter(mnist_binarized_generator(8, n_examples=64)()))
    assert set(np.unique(bim)).issubset({0.0, 1.0})


def test_small_imagenet_and_lsun_fake():
    b = next(small_imagenet_32_generator(4))
    assert b.shape == (4, 3, 32, 32)
    f = lsun256_test_generator(2)
    b1, b2 = next(f), next(f)
    np.testing.assert_array_equal(b1, b2)


def test_audio_generator():
    b = next(iter(audio_generator(2, seq_len=1024)()))
    assert b.shape == (2, 1024)
    assert np.abs(b).max() <= 1.0


def test_handwriting_render():
    strokes = np.array(
        [[0, 0, 0], [10, 0, 0], [0, 10, 1], [5, 5, 0], [-5, 5, 1]], "float32"
    )
    lines = strokes_to_points(strokes)
    assert len(lines) >= 1
    img = render_strokes(strokes, size=64)
    assert img.shape == (64, 64)
    assert img.max() == 255  # something was drawn
    norm = normalize_strokes(strokes)
    assert np.isclose(norm[:, :2].std(), 1.0, rtol=1e-5)


def test_img_tile_and_stretch():
    imgs = np.random.default_rng(0).uniform(-1, 1, size=(9, 8, 8, 3))
    tiled = img_tile(imgs, stretch=True)
    assert tiled.shape == (8 * 3 + 2, 8 * 3 + 2, 3)
    assert tiled.min() >= 0 and tiled.max() <= 1
    s = img_stretch(np.array([-2.0, 0.0, 2.0]))
    np.testing.assert_allclose(s, [0, 0.5, 1])


def test_lsuv_init_unit_variance():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 32)).astype("f4") * 5)
    with init_context(seed=0) as ctx:
        linear("L.Out", 32, 64, x)
    params = ctx.params

    def fwd(name):
        return linear("L.Out", 32, 64, x)

    new = lsuv_init(params, fwd, ["L.Out.W"], jax.random.PRNGKey(0))
    from ctgan_tpu.core import apply_context

    with apply_context(new):
        out = linear("L.Out", 32, 64, x)
    assert abs(float(jnp.var(out)) - 1.0) < 0.1
