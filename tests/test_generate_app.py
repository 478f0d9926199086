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


def test_serve_bench_fresh_init(capsys):
    # --serve_iters without --ckpt: fresh-init weights, scan-window timed,
    # one JSON line on stdout.
    import json

    r = gen_main(cfg=GenConfig(model="mnist", dim=8, batch=8, serve_iters=6))
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    assert parsed == {k: v for k, v in r.items()}
    assert r["value"] > 0 and r["sec_per_batch"] > 0
    assert r["unit"] == "images/sec/chip"
    assert r["params"].startswith("fresh-init")


def test_serve_bench_from_checkpoint(tmp_path):
    mnist_main(cfg=MnistConfig(
        DIM=8, BATCH_SIZE=8, ITERS=2, n_examples=64, sample_every=10,
        save_every=2, out_dir=str(tmp_path),
    ))
    r = gen_main(cfg=GenConfig(
        model="mnist", dim=8, batch=8, serve_iters=6,
        ckpt=str(tmp_path / "ckpt" / "ckpt_2.npz"),
    ))
    assert r["params"] == "checkpoint"
    assert r["value"] > 0
