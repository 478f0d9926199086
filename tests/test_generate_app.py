"""Generation/serving app: checkpoint -> samples."""

import os

import numpy as np

from ctgan_tpu.apps.generate import Config as GenConfig, load_gen_params, main as gen_main
from ctgan_tpu.apps.ct_gan_mnist import Config as MnistConfig, main as mnist_main


def test_generate_from_checkpoint(tmp_path):
    mnist_main(cfg=MnistConfig(
        DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=10,
        save_every=2, out_dir=str(tmp_path),
    ))
    ckpt = str(tmp_path / "ckpt" / "ckpt_2.npz")
    samples = gen_main(cfg=GenConfig(
        model="mnist", ckpt=ckpt, n=16, batch=8, dim=8,
        out_prefix=str(tmp_path / "gen"), save_npz=True,
    ))
    assert samples.shape == (16, 784)
    assert os.path.exists(tmp_path / "gen.png")
    assert os.path.exists(tmp_path / "gen.npz")
    params = load_gen_params(ckpt)
    assert all(k.startswith("Generator") for k in params)
