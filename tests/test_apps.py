"""Short-horizon smoke tests for every entry-point app (tiny configs)."""

import os

import pytest

import jax

# Heavy app tests compile multiple full training programs; on a single-core
# CPU that is ~40 minutes total, so everything beyond the MNIST apps is
# gated behind -m slow (run explicitly: pytest -m slow).
slow = pytest.mark.slow


def test_mnist_app(tmp_path):
    from ctgan_tpu.apps.ct_gan_mnist import Config, main

    cfg = Config(DIM=8, BATCH_SIZE=8, ITERS=3, n_examples=64, sample_every=2,
                 save_every=2, out_dir=str(tmp_path))
    main(cfg=cfg)
    files = os.listdir(tmp_path)
    assert "log.ndjson" in files
    assert any(f.startswith("samples_") for f in files)
    assert os.listdir(tmp_path / "ckpt")


def test_mnist_app_resume(tmp_path):
    from ctgan_tpu.apps.ct_gan_mnist import Config, main

    cfg = Config(DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=10,
                 save_every=2, out_dir=str(tmp_path))
    main(cfg=cfg)
    cfg2 = Config(DIM=8, BATCH_SIZE=8, ITERS=4, n_examples=64, sample_every=10,
                  save_every=2, out_dir=str(tmp_path))
    state = main(cfg=cfg2)  # resumes from iteration 2
    assert int(state.step) == 4


@slow
def test_cifar_app(tmp_path):
    from ctgan_tpu.apps.ct_gan_cifar import Config, main

    cfg = Config(DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=2,
                 inception_every=2, inception_samples=100, save_every=2,
                 out_dir=str(tmp_path))
    main(cfg=cfg)
    assert os.path.exists(tmp_path / "disc_params.npz")


@slow
def test_resnet_app(tmp_path):
    from ctgan_tpu.apps.ct_gan_cifar_resnet import Config, main

    cfg = Config(DIM_G=8, DIM_D=8, BATCH_SIZE=8, ITERS=2, n_examples=64,
                 sample_every=2, INCEPTION_FREQUENCY=0, save_every=2,
                 inception_samples=100, out_dir=str(tmp_path))
    state = main(cfg=cfg)
    assert int(state.step) == 2


@slow
@pytest.mark.parametrize(
    "arch", ["good", "dcgan", "fc", "multiplicative", "crippled", "resnet101"]
)
def test_64x64_app(tmp_path, arch):
    from ctgan_tpu.apps.ct_gan_64x64 import Config, main

    cfg = Config(ARCH=arch, DIM=8, BATCH_SIZE=4, ITERS=2, CRITIC_ITERS=2,
                 sample_every=2, save_every=2, out_dir=str(tmp_path / arch))
    state = main(cfg=cfg)
    assert int(state.step) == 2


@slow
def test_lsun128_app(tmp_path):
    from ctgan_tpu.apps.wgan_lsun128 import Config, main

    cfg = Config(BATCH_SIZE=2, CRITIC_ITERS=2, ITERS=2, DIM_G_4=16, DIM_D_8=16,
                 sample_every=2, save_every=2, out_dir=str(tmp_path))
    state = main(cfg=cfg)
    assert int(state.step) == 2


@slow
def test_mnist_ssl_app(tmp_path, monkeypatch):
    import ctgan_tpu.data.mnist as mnist_mod
    from ctgan_tpu.apps.ct_mnist_ssl import Config, main

    # shrink the dataset for the smoke test
    orig = mnist_mod.load_arrays

    def small(path=None, n_examples=None):
        from ctgan_tpu.data.synthetic import synthetic_mnist

        tr, dev, te = synthetic_mnist(600, 100, 200)
        return {"train": tr, "dev": dev, "test": te}

    monkeypatch.setattr(mnist_mod, "load_arrays", small)
    cfg = Config(epochs=1, batch_size=100, out_dir=str(tmp_path))
    state = main(cfg=cfg)
    assert os.path.exists(tmp_path / "disc_params.npz")


@slow
def test_cifar_ssl_app(tmp_path, monkeypatch):
    import ctgan_tpu.data.cifar10 as cifar_mod
    from ctgan_tpu.apps.ct_cifar_ssl import Config, main

    def small(data_dir=None, subset="train"):
        from ctgan_tpu.data.synthetic import synthetic_images
        import numpy as np

        n = 300 if subset == "train" else 100
        flat, y = synthetic_images(n, 3, 32, seed=0 if subset == "train" else 1)
        x = flat.reshape(-1, 3, 32, 32).astype("float32") / 255.0 - 0.5
        return x, y

    monkeypatch.setattr(cifar_mod, "load_normalized", small)
    cfg = Config(epochs=1, batch_size=50, count=20, chunk=1, out_dir=str(tmp_path))
    state = main(cfg=cfg)
    assert os.path.exists(tmp_path / "gen_params.npz")
    # temporal-ensembling variant
    cfg2 = Config(epochs=1, batch_size=50, count=20, temporal_ensembling=True,
                  chunk=1, out_dir=str(tmp_path / "te"))
    main(cfg=cfg2)


def test_onehot_toys(tmp_path):
    from ctgan_tpu.apps.onehot_toys import Config, main

    main(cfg=Config(which="wgan", ITERS=3, BATCH_SIZE=16, OUTPUT_DIM=64,
                    DIM=32, out_dir=str(tmp_path / "w")))
    main(cfg=Config(which="ae", ITERS=2, BATCH_SIZE=16,
                    out_dir=str(tmp_path / "a")))


def _tiny_ssl_models(monkeypatch):
    """Tiny CT_CIFAR nets with the real apps' contract; see tiny_ssl.py
    (shared with the cross-process determinism test)."""
    from tiny_ssl import apply_tiny_ssl_models

    apply_tiny_ssl_models(setter=monkeypatch.setattr)


def _small_cifar(monkeypatch):
    from tiny_ssl import apply_small_cifar

    apply_small_cifar(setter=monkeypatch.setattr)


@slow
def test_cifar_ssl_epoch_scan_matches_chunked(tmp_path, monkeypatch):
    """epoch_scan (device-resident data, one dispatch/epoch) must produce
    the same training trajectory as the chunked path: same host
    permutations + same per-step key derivation + same gathers.
    (Tolerance covers cross-program float reassociation; the measured
    same-magnitude chunk=1-vs-chunk=2 noise calibrates it.)"""
    import numpy as np

    from ctgan_tpu.apps.ct_cifar_ssl import Config, main
    from ctgan_tpu.utils import load_checkpoint

    _small_cifar(monkeypatch)
    _tiny_ssl_models(monkeypatch)
    base = dict(epochs=2, batch_size=50, count=10, temporal_ensembling=True)
    main(cfg=Config(**base, chunk=2, out_dir=str(tmp_path / "chunked")))
    main(cfg=Config(**base, epoch_scan=True, out_dir=str(tmp_path / "scan")))
    a = load_checkpoint(str(tmp_path / "chunked" / "disc_params.npz"))
    b = load_checkpoint(str(tmp_path / "scan" / "disc_params.npz"))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=2e-4,
                                   err_msg=k)


@slow
def test_cifar_ssl_resume(tmp_path, monkeypatch):
    """Epoch-level crash/resume: a 1-epoch run resumed to 2 epochs matches
    an uninterrupted 2-epoch run exactly (permutations derive from
    (seed, epoch), so no generator fast-forward is needed)."""
    import numpy as np

    from ctgan_tpu.apps.ct_cifar_ssl import Config, main
    from ctgan_tpu.utils import load_checkpoint

    _small_cifar(monkeypatch)
    _tiny_ssl_models(monkeypatch)
    base = dict(batch_size=50, count=10, temporal_ensembling=True, chunk=2)
    main(cfg=Config(**base, epochs=2, out_dir=str(tmp_path / "full")))
    main(cfg=Config(**base, epochs=1, out_dir=str(tmp_path / "resumed")))
    main(cfg=Config(**base, epochs=2, out_dir=str(tmp_path / "resumed")))
    a = load_checkpoint(str(tmp_path / "full" / "disc_params.npz"))
    b = load_checkpoint(str(tmp_path / "resumed" / "disc_params.npz"))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)


def _small_mnist(monkeypatch):
    import ctgan_tpu.data.mnist as mnist_mod

    def small(path=None, n_examples=None):
        from ctgan_tpu.data.synthetic import synthetic_mnist

        tr, dev, te = synthetic_mnist(500, 100, 200)
        return {"train": tr, "dev": dev, "test": te}

    monkeypatch.setattr(mnist_mod, "load_arrays", small)


def test_mnist_ssl_epoch_scan_matches_chunked(tmp_path, monkeypatch):
    """MNIST SSL epoch_scan must reproduce the chunked trajectory (same
    (seed, epoch) permutations, same per-step key derivation); tolerance
    covers cross-program float reassociation, as in the CIFAR test."""
    import numpy as np

    from ctgan_tpu.apps.ct_mnist_ssl import Config, main
    from ctgan_tpu.utils import load_checkpoint

    _small_mnist(monkeypatch)
    base = dict(epochs=2, batch_size=100, count=10)
    main(cfg=Config(**base, out_dir=str(tmp_path / "chunked")))
    main(cfg=Config(**base, epoch_scan=True, out_dir=str(tmp_path / "scan")))
    a = load_checkpoint(str(tmp_path / "chunked" / "disc_params.npz"))
    b = load_checkpoint(str(tmp_path / "scan" / "disc_params.npz"))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=2e-4,
                                   err_msg=k)


def test_mnist_ssl_resume(tmp_path, monkeypatch):
    """MNIST SSL epoch-level crash/resume is exact (1+1 epochs == 2)."""
    import numpy as np

    from ctgan_tpu.apps.ct_mnist_ssl import Config, main
    from ctgan_tpu.utils import load_checkpoint

    _small_mnist(monkeypatch)
    base = dict(batch_size=100, count=10, epoch_scan=True)
    main(cfg=Config(**base, epochs=2, out_dir=str(tmp_path / "full")))
    main(cfg=Config(**base, epochs=1, out_dir=str(tmp_path / "resumed")))
    main(cfg=Config(**base, epochs=2, out_dir=str(tmp_path / "resumed")))
    a = load_checkpoint(str(tmp_path / "full" / "disc_params.npz"))
    b = load_checkpoint(str(tmp_path / "resumed" / "disc_params.npz"))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)
